"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §2.3
scale note: "pre-partitioning/bucketing for co-located joins").

At 100 TB the biggest recurring cost is re-shuffling the same tables on
the same keys for every join. Bucketing amortizes it: write each table
ONCE hash-bucketed (and sorted) by its join key, and every subsequent
equi-join on that key is exchange-free — Catalyst sees matching output
partitionings and plans a SortMergeJoin with no Exchange on either
side. This is the storage-level analog of the session-level persist
caches in plans/pipeline.py: the persist survives a session, the
bucketed table survives the cluster.

The KG's natural bucketed layout: nodes by ``id``, edges by ``subject``
— the keys every hop/label/degree join uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``.

    n_buckets is a data-size decision (≈ total size / healthy task
    input), not a cluster-size one — the bucket count is baked into the
    files, so pick for the table's lifetime."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_equijoin(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on ``key`` — exchange-free when their
    bucket counts match (pinned by test_bucketed_join_no_exchange)."""
    return spark.table(left_table).join(spark.table(right_table), key)
