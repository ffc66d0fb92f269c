"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no streaming (monthly batch, SURVEY.md §2.9); this is
the engine's forward-looking stateful surface: per-user running totals
maintained in explicit state across micro-batches. The same shape carries
any incremental KG bookkeeping (e.g. per-entity mention counters that
survive restarts via the state store).

Semantics: for every micro-batch, each user's state (n_events, sum_value
as exact cents) is updated and one row with the *running* totals is
emitted (append mode) — so the last emitted row per user equals the batch
aggregate over everything seen, which is what the parity test asserts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value_cents", LongType(), False),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("sum_value_cents", LongType(), False),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState,
            ) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents — float sums would drift across batch splits
        cents += int(round(pdf["value"].astype(float).mul(100).sum()))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value_cents": [cents]}
    )


def user_running_totals_stream(spark: SparkSession, events_dir: str,
                               query_name: str = "user_totals",
                               max_files_per_trigger: int = 1) -> DataFrame:
    """Stream events (one file per micro-batch) through the stateful
    operator; returns the append-mode memory-sink table (one row per user
    per trigger — the last row per user is the running total)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def user_totals_batch(spark: SparkSession, events_dir: str) -> DataFrame:
    """The batch equivalent the stream must converge to."""
    return (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
    )
