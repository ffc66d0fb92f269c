"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline number is the end-to-end KG build (text kernel → mention
detection → triple extraction → node/edge materialization) plus the
flagship query set; triples/sec and docs/sec are reported alongside so the
round-over-round trend is visible in throughput terms, matching
BASELINE.json's metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from kg_covid_19_spark.operators.dedup import DEDUP_QUERIES  # noqa: E402
from kg_covid_19_spark.operators.similarity import SIM_QUERIES  # noqa: E402
from kg_covid_19_spark.operators.triples import kg_openie_triples  # noqa: E402
from kg_covid_19_spark.plans.corpus_export import corpus_export  # noqa: E402
from kg_covid_19_spark.plans.pipeline import get_kg  # noqa: E402
from kg_covid_19_spark.plans.queries import KG_QUERIES  # noqa: E402
from kg_covid_19_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "kg_category_counts",
    "kg_provided_by_counts",
    "kg_one_hop",
    "kg_two_hop",
    "kg_druggable_two_hop",
    "kg_drug_mentions",
    "kg_mention_counts",
    "kg_cooccurrence_counts",
    "kg_pagerank",
]

# The 10 queries whose sum IS the r01-comparable headline `value`.
# FROZEN — never append here; new bench queries go to BENCH_QUERIES /
# PIPELINE_BENCH and are reported in `queries` + `suite_sec` only.
R01_HEADLINE_QUERIES = [
    "kg_build",
    "kg_category_counts",
    "kg_provided_by_counts",
    "kg_one_hop",
    "kg_two_hop",
    "kg_druggable_two_hop",
    "kg_drug_mentions",
    "kg_mention_counts",
    "kg_cooccurrence_counts",
    "kg_openie_triples",
]

# LLM-pipeline operator suite (dedup / similarity / corpus export) —
# benched alongside the KG chain so scale regressions there surface in
# BENCH_r* too, not just in correctness.
PIPELINE_BENCH = {
    "doc_dedup_exact": DEDUP_QUERIES["doc_dedup_exact"],
    "doc_minhash_candidates": DEDUP_QUERIES["doc_minhash_candidates"],
    "doc_neardup_pairs": DEDUP_QUERIES["doc_neardup_pairs"],
    "doc_simhash_neardup": DEDUP_QUERIES["doc_simhash_neardup"],
    "doc_decontaminate": DEDUP_QUERIES["doc_decontaminate"],
    "emb_knn_bruteforce": SIM_QUERIES["emb_knn_bruteforce"],
    "emb_lsh_ann": SIM_QUERIES["emb_lsh_ann"],
    "emb_cosine_neardup": SIM_QUERIES["emb_cosine_neardup"],
    "emb_ivf_ann": SIM_QUERIES["emb_ivf_ann"],
    "corpus_export": corpus_export,
    # graph-algorithm suite (post-r01 additions — timed in suite_sec,
    # deliberately outside the frozen headline `value`)
    "kg_triangle_counts": KG_QUERIES["kg_triangle_counts"],
    "kg_hub_distances": KG_QUERIES["kg_hub_distances"],
    "kg_linked_mentions_scored": KG_QUERIES["kg_linked_mentions_scored"],
    "kg_components": KG_QUERIES["kg_components"],
    "kg_resource_allocation": KG_QUERIES["kg_resource_allocation"],
}


def _calibrate(spark) -> dict:
    """Machine-noise calibration, reported alongside the timings so a
    round-over-round comparison can tell a plan regression from a noisy
    host window (observed on this VM: the same commit benched its
    headline 11.6 s and 16.7 s two hours apart while taskset-pinned
    fixed workloads stayed within 10%). Two fixed probes:
    * ``calib_cpu_sec``  — single-thread Python arithmetic loop;
    * ``calib_spark_sec`` — a fixed 32-partition JVM-only aggregation.
    Ratios of the same probe across rounds approximate the host-speed
    ratio at each measurement time."""
    import time as _t

    t0 = _t.time()
    s = 0
    for i in range(20_000_000):
        s += i
    cpu = _t.time() - t0
    t0 = _t.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id * 3 + 1)"
    ).collect()
    sp = _t.time() - t0
    return {
        "calib_cpu_sec": round(cpu, 3),
        "calib_spark_sec": round(sp, 3),
    }


def main() -> None:
    spark = get_spark(app_name="kg-spark-bench")
    spark.range(1).count()  # JVM warm-up, excluded from timings
    # Python/Arrow worker warm-up (daemon fork pool + Arrow codepaths):
    # otherwise the first pandas-UDF query pays ~2-8s of worker startup
    # that has nothing to do with its plan
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(64).repartition(32).select(_warm("id")).count()
    calib = _calibrate(spark)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # graph materialization (build + persist + count) — the north rule's
    # "graph materialize" stage; queries then run against the artifact.
    t0 = time.time()
    nodes, edges = get_kg(spark, SF_DIR)
    build_sec = time.time() - t0
    n_nodes = nodes.count()
    n_edges = edges.count()

    queries: dict[str, float] = {"kg_build": round(build_sec, 3)}
    for name in BENCH_QUERIES:
        fn = KG_QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).agg(F.count("*")).collect()
        queries[name] = round(time.time() - t0, 3)
    t0 = time.time()
    kg_openie_triples(spark, SF_DIR).agg(F.count("*")).collect()
    queries["kg_openie_triples"] = round(time.time() - t0, 3)

    # headline `value` = the KG chain exactly as BENCH_r01 defined it,
    # pinned by an explicit frozen list (NOT sum-minus-name): a query
    # appended to BENCH_QUERIES later lands in suite_sec/queries without
    # silently inflating the r01-comparable headline.
    kg_chain_total = sum(queries[n] for n in R01_HEADLINE_QUERIES)

    for name, fn in PIPELINE_BENCH.items():
        t0 = time.time()
        fn(spark, SF_DIR).agg(F.count("*")).collect()
        queries[name] = round(time.time() - t0, 3)

    total = sum(queries.values())
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_total_sec",
                "value": round(kg_chain_total, 3),
                "unit": "sec",
                "suite_sec": round(total, 3),
                "queries": queries,
                "sf": float(sf),
                "n_docs": n_docs,
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "triples_per_sec": round(n_edges / build_sec, 1),
                "docs_per_sec": round(n_docs / build_sec, 1),
                **calib,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
