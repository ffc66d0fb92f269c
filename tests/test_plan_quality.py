"""Physical-plan regression tests — the scale properties the README
claims are asserted here so a refactor can't silently lose them:
predicate pushdown + column pruning into the parquet scan, broadcast
(not sort-merge) dimension joins, and a single Arrow UDF evaluation in
the mention chain with at most the one ingest repartition exchange."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kg_covid_19_spark.plans.pipeline import doc_mentions
from kg_covid_19_spark.plans.relational import REL_QUERIES

from conftest import SF_DIR


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_scan_is_pruned_and_pushed(spark):
    plan = _executed_plan(REL_QUERIES["rel_tpch_q1"](spark, SF_DIR))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # filter reached the scan
    assert "l_shipdate" in scan and "DataFilters: [" in scan
    assert re.search(r"DataFilters: \[isnotnull\(l_shipdate", scan)
    # projection pruned: no l_comment / l_orderkey in the read schema
    assert "l_comment" not in scan
    assert "l_orderkey" not in scan


def test_dim_joins_broadcast_not_sort_merge(spark):
    plan = _executed_plan(REL_QUERIES["rel_broadcast_dims"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_mention_chain_single_udf_min_exchanges(spark):
    # explicit langs → distinct logical plan, so the session-cached
    # mentions frame (get_mentions persists an identical-plan DF) can't
    # shadow this test with an InMemoryTableScan
    plan = _executed_plan(
        doc_mentions(spark, SF_DIR, langs=("en", "de", "fr", "es", "xx"))
    )
    assert "InMemoryTableScan" not in plan
    # the Arrow kernel is evaluated exactly once (no Catalyst duplication
    # via inferred size()>0 filters — see doc_mentions docstring)
    assert plan.count("ArrowEvalPython") == 1
    # narrow chain: at most the one ingest repartition exchange
    n_exchange = len(
        re.findall(r"Exchange (?!SinglePartition)", plan)
    )
    assert n_exchange <= 1, plan


def test_filter_in_pushed_to_scan(spark):
    plan = _executed_plan(REL_QUERIES["rel_filter_in"](spark, SF_DIR))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert re.search(r"l_returnflag#\d+ IN \(A,N\)", scan)
