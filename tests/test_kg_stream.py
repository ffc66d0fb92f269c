"""Streaming KG ingestion: batch/stream parity and exactly-once resume."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from kg_covid_19_spark.streaming.kg_stream import (
    batch_mention_edges,
    stream_mention_edges,
)

from conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_batch_and_resumes_exactly_once(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    staged = str(tmp_path / "staged")
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    (
        docs.withColumn("part", F.col("doc_id") % 3)
        .repartition(3, "part")
        .drop("part")
        .write.parquet(staged)
    )
    parts = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    assert len(parts) == 3
    # stage 2 of 3 files, drain the stream
    for f in parts[:2]:
        shutil.copy(f"{staged}/{f}", f"{incoming}/{f}")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "edges")
    first = stream_mention_edges(spark, incoming, ckpt, out)
    n_first = first.count()
    assert n_first > 0

    # new file lands; same checkpoint → only the delta is processed
    shutil.copy(f"{staged}/{parts[2]}", f"{incoming}/{parts[2]}")
    resumed = stream_mention_edges(spark, incoming, ckpt, out)

    want = batch_mention_edges(spark, incoming)
    assert _rows(resumed) == _rows(want)  # parity incl. no duplicates
    assert resumed.count() > n_first  # the delta actually arrived
    # exactly-once: per (subject, object) at most one row
    assert (
        resumed.groupBy("subject", "object").count()
        .filter(F.col("count") > 1).count() == 0
    )
