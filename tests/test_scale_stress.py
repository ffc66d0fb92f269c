"""Dictionary-scale stress: the two dictionary-driven kernels at
realistic (10³-10⁴ surface) dictionary sizes — the regime the r2
verdict flagged as the difference between a toy and a production
entity-linking/mention plan. Not a benchmark (no timing assertions);
these pin that the PLAN SHAPE survives the scale-up: the blocked
fuzzy join stays a hash join with bounded candidates, and the
Aho-Corasick mention automaton builds and runs over thousands of
patterns."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from conftest import SF_DIR


def _synthetic_dict(n: int) -> list[tuple[str, str]]:
    """n deterministic (term, curie) surfaces, word-like, length 4-12."""
    out = []
    for i in range(n):
        h = f"{i:05d}"
        term = ("term" + h)[: 4 + (i % 9)]
        out.append((term, f"SYN:{h}"))
    return out


def test_blocked_linking_scales_to_synthetic_dictionary(spark):
    from kg_covid_19_spark.plans.queries import (
        LINK_MAX_DIST,
        linked_mentions_scored,
    )

    gaz = spark.createDataFrame(
        _synthetic_dict(5000), "term string, curie string"
    )
    df = linked_mentions_scored(spark, SF_DIR, gaz)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # still the blocked equi-join — a 5k dictionary must NOT degrade
    # the plan to a nested loop
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    # argmin output: one row per linked token, distances within bound
    assert len(rows) == len({r["token"] for r in rows})
    assert all(r["distance"] <= LINK_MAX_DIST for r in rows)


def test_mention_automaton_scales_to_synthetic_gazetteer(spark):
    from kg_covid_19_spark.operators.mentions import make_curie_udf

    entries = [
        (t, c, t, "biolink:NamedThing") for t, c in _synthetic_dict(10_000)
    ]
    # plant a surface that occurs in the synthetic corpus so the sweep
    # provably matches something
    entries.append(("spark", "SYN:PLANT0", "spark", "biolink:NamedThing"))
    # distinct cache_key: the worker-side matcher cache is keyed, and
    # reusing "default-curies" would poison the canonical gazetteer's
    # cached automaton for every later query in this session
    udf = make_curie_udf(entries=entries, cache_key="stress-10k")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    got = (
        docs.select(F.explode_outer(udf(F.col("text"))).alias("curie"))
        .groupBy("curie")
        .count()
        .collect()
    )
    curies = {r["curie"] for r in got}
    assert "SYN:PLANT0" in curies  # the planted surface matched
    # every emitted curie comes from the supplied dictionary
    assert all(c is None or re.match(r"SYN:\d|SYN:PLANT", c) for c in curies)
