"""Resumability contract: crash mid-job → restart skips completed
partitions → final result identical to the single-shot pipeline."""

from __future__ import annotations

import pytest

from kg_covid_19_spark.plans.checkpoint import CheckpointedKGBuild
from kg_covid_19_spark.plans.pipeline import build_kg

from conftest import SF_DIR


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_checkpoint_resume_equals_single_shot(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    job = CheckpointedKGBuild(SF_DIR, out, n_buckets=4)

    # crash after 2 of 4 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(spark, fail_after=2)
    assert len(job.completed()) == 2

    # restart: only the remaining 2 buckets run
    manifest = job.run(spark)
    assert len(job.completed()) == 4
    assert all(m["status"] == "complete" for m in manifest.values())
    assert all(m["n_edges"] > 0 and m["content_hash"] for m in manifest.values())
    # lineage: input rows across buckets == corpus size
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(m["input_rows"] for m in manifest.values()) == n_docs

    ck_nodes, ck_edges = job.load_result(spark)
    ss_nodes, ss_edges = build_kg(spark, SF_DIR)
    assert _canon(ck_nodes) == _canon(
        ss_nodes.groupBy("id", "name", "category", "provided_by").count()
        .drop("count")
    )
    assert _canon(ck_edges) == _canon(ss_edges)


def test_rerun_is_noop(spark, tmp_path):
    out = str(tmp_path / "ckpt2")
    job = CheckpointedKGBuild(SF_DIR, out, n_buckets=2)
    m1 = job.run(spark)
    h1 = {b: m["content_hash"] for b, m in m1.items()}
    m2 = job.run(spark)  # all buckets complete → skip everything
    h2 = {b: m["content_hash"] for b, m in m2.items()}
    assert h1 == h2
