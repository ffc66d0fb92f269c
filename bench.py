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

# One decade above the driver's largest scale: the deterministic sf1
# replica set (tools/gen_testdata.py). When present, the KG chain is
# re-timed there so every BENCH round carries a 10x data point.
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data", "sf1"),
)

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


def _late_bench():
    # r4 additions — timed in suite_sec only, like every post-r01 query
    from kg_covid_19_spark.operators.multimodal import MULTIMODAL_QUERIES

    return {
        "kg_components_fixpoint": KG_QUERIES["kg_components_fixpoint"],
        "media_grid_neardup": MULTIMODAL_QUERIES["media_grid_neardup"],
        # r6 span-level dedup family — the corpus-keyed shuffle lives in
        # doc_dup_spans; strip/profile ride its output
        "doc_dup_spans": DEDUP_QUERIES["doc_dup_spans"],
        "doc_dup_span_strip": DEDUP_QUERIES["doc_dup_span_strip"],
        "doc_dup_profile": DEDUP_QUERIES["doc_dup_profile"],
        # r6 second wave — edge cohesion + LM scoring + curation manifest
        "kg_edge_support": KG_QUERIES["kg_edge_support"],
        "kg_ktruss_fixpoint": KG_QUERIES["kg_ktruss_fixpoint"],
        "txt_bigram_lm": _textstats()["txt_bigram_lm"],
        "doc_dedup_keep_best": DEDUP_QUERIES["doc_dedup_keep_best"],
        # r6 third wave — incremental-ingest ops, validation, web rollup
        "doc_incremental_neardup": DEDUP_QUERIES["doc_incremental_neardup"],
        "kg_incremental_merge": KG_QUERIES["kg_incremental_merge"],
        "kg_schema_validation": KG_QUERIES["kg_schema_validation"],
        "evt_rate_spikes": _evt_rate_spikes,
        "web_host_stats": _web_host_stats,
        "web_dump_overlap": DEDUP_QUERIES["web_dump_overlap"],
        "web_dedup_savings": DEDUP_QUERIES["web_dedup_savings"],
        "kg_cooc_lift": KG_QUERIES["kg_cooc_lift"],
        "kg_assoc_topk": KG_QUERIES["kg_assoc_topk"],
        "kg_lift_incremental": KG_QUERIES["kg_lift_incremental"],
        "evt_temporal_split": _evt_temporal_split,
        "kg_random_walks": KG_QUERIES["kg_random_walks"],
        "kg_walk_skipgrams": KG_QUERIES["kg_walk_skipgrams"],
        "web_quality_funnel": DEDUP_QUERIES["web_quality_funnel"],
        "evt_bot_users": _evt_bot_users,
        "kg_ego_export": _kg_ego_export,
    }


def _evt_bot_users(spark, sf_dir):
    from kg_covid_19_spark.streaming.events import evt_bot_users

    return evt_bot_users(spark, sf_dir)


def _kg_ego_export(spark, sf_dir):
    from kg_covid_19_spark.plans.merged import kg_ego_export

    return kg_ego_export(spark, sf_dir)


def _evt_temporal_split(spark, sf_dir):
    from kg_covid_19_spark.streaming.events import evt_temporal_split

    return evt_temporal_split(spark, sf_dir)


def _evt_rate_spikes(spark, sf_dir):
    from kg_covid_19_spark.streaming.events import evt_rate_spikes

    return evt_rate_spikes(spark, sf_dir)


def _web_host_stats(spark, sf_dir):
    from kg_covid_19_spark.functions.urls import web_host_stats

    return web_host_stats(spark, sf_dir)


def _textstats():
    from kg_covid_19_spark.functions.textstats import TEXTSTATS_QUERIES

    return TEXTSTATS_QUERIES


PIPELINE_BENCH.update(_late_bench())


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


def _scale_slices(spark) -> dict:
    """Design-point slices for the two deliberate r3 plan trades — the
    production plans must WIN here, turning the scale argument into
    measured numbers (VERDICT r3 item 4).

    * Planted-hub triangle slice: star hub (degree HUB_DEG) + leaf ring.
      Under id-ordering the hub (lowest id) generates C(HUB_DEG, 2)
      wedge rows; under the production degree-ordering the hub only
      ever closes wedges. Same triangle output (asserted in
      tests/test_scale_stress.py), wildly different intermediates.
    * 5k-surface dictionary slice: blocked SymSpell equi-join linking
      vs the pre-r3 broadcast nested-loop with a levenshtein predicate,
      on identical (vocab, dictionary) inputs.
    """
    from kg_covid_19_spark.plans.queries import (
        LINK_MAX_DIST,
        score_linked_tokens,
        triangle_counts_frame,
    )

    out: dict[str, float] = {}

    # -- planted-hub triangles -----------------------------------------
    HUB_DEG = 6000
    hub = spark.range(1, HUB_DEG + 1).select(
        F.lit(0).alias("subject"), F.col("id").alias("object")
    )
    ring = spark.range(1, HUB_DEG).select(
        F.col("id").alias("subject"), (F.col("id") + 1).alias("object")
    )
    e = hub.unionAll(ring).persist()
    deg = (
        e.select(F.col("subject").alias("id"))
        .unionAll(e.select(F.col("object").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    e.count(), deg.count()  # exclude input materialization from timings
    for label, ordered in (
        ("tri_skew_degree_ordered", True),
        ("tri_skew_id_ordered", False),
    ):
        t0 = time.time()
        triangle_counts_frame(e, deg, degree_ordered=ordered).agg(
            F.count("*")
        ).collect()
        out[label] = round(time.time() - t0, 3)
    e.unpersist(), deg.unpersist()

    # -- 5k-surface dictionary linking ---------------------------------
    # vocabulary = 2k real corpus tokens + 18k synthetic (a web-scale
    # vocab is far larger than the dictionary); nested-loop cost is
    # V×D levenshtein evals (100M here), blocked cost is (V+D)·len²
    # keys + sparse candidates
    VOCAB_CORPUS, VOCAB_SYNTH = 2000, 38_000
    DICT_DERIVED, DICT_FILLER = 2500, 2500
    corpus_toks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .orderBy("token")
        .limit(VOCAB_CORPUS)
    )
    synth_toks = spark.range(VOCAB_SYNTH).select(
        F.concat(F.lit("wq"), F.col("id").cast("string"), F.lit("w"))
        .alias("token")
    )
    toks = corpus_toks.unionAll(synth_toks).persist()
    derived = (
        corpus_toks.orderBy("token")
        .limit(DICT_DERIVED)
        .select(
            # one-char-extended surfaces: within lev 1 of a real token,
            # so the verify stage is non-vacuous on both plans
            F.concat(F.col("token"), F.lit("x")).alias("term"),
            F.concat(F.lit("X:"), F.col("token")).alias("curie"),
        )
    )
    filler = spark.range(DICT_FILLER).select(
        F.concat(F.lit("zq"), F.col("id").cast("string"), F.lit("qz"))
        .alias("term"),
        F.concat(F.lit("F:"), F.col("id").cast("string")).alias("curie"),
    )
    gaz = derived.unionAll(filler).persist()
    toks.count(), gaz.count()
    t0 = time.time()
    score_linked_tokens(toks, gaz).agg(F.count("*")).collect()
    out["link_blocked"] = round(time.time() - t0, 3)
    # the pre-r3 shape, bench-only (deliberately NOT in the package):
    # broadcast nested loop over vocab × dictionary with the levenshtein
    # predicate — the plan test forbids this in production
    t0 = time.time()
    d_nl = F.levenshtein(F.col("token"), F.col("term"))
    (
        toks.join(F.broadcast(gaz), d_nl <= LINK_MAX_DIST)
        .groupBy("token")
        .agg(F.min(F.struct(d_nl.alias("distance"), F.col("curie"))))
        .agg(F.count("*"))
        .collect()
    )
    out["link_nested_loop"] = round(time.time() - t0, 3)
    toks.unpersist(), gaz.unpersist()

    out["tri_skew_speedup"] = round(
        out["tri_skew_id_ordered"] / max(out["tri_skew_degree_ordered"], 1e-9), 2
    )
    out["link_speedup"] = round(
        out["link_nested_loop"] / max(out["link_blocked"], 1e-9), 2
    )
    return out


def _calibrated_vs_prev(queries: dict, calib: dict,
                        section: str | None = None) -> dict:
    """Host-noise-corrected round-over-round deltas (VERDICT r3 item 8):
    scale this round's per-query seconds by the ratio of the fixed
    Spark calibration probe vs the previous round's BENCH file, so a
    genuine plan regression separates from the ~10% (observed up to 2×)
    host-speed oscillation. Previous file = highest BENCH_r*.json here.
    ``section`` compares against a sub-object of the previous file (the
    "sf1" block) instead of its top level."""
    import glob
    import re as _re

    benches = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r*.json")),
        key=lambda p: int(_re.search(r"r(\d+)", p).group(1)),
    )
    # newest round file whose calibration probe is recoverable — the
    # driver wraps bench's JSON under "parsed", which can be null when
    # its own parse failed (the r4 file), so walk backwards
    prev, prev_file = None, None
    for path in reversed(benches):
        with open(path) as fh:
            cand = json.load(fh)
        cand = cand.get("parsed") or cand
        if cand.get("calib_spark_sec") and (
            section is None or cand.get(section)
        ):
            prev, prev_file = cand, path
            break
    if prev is None:
        return {}
    prev_probe = prev["calib_spark_sec"]
    if section is not None:
        prev = prev[section]
    ratio = calib["calib_spark_sec"] / prev_probe
    prev_q = prev.get("queries", {})
    return {
        "calib_ratio_vs_prev": round(ratio, 3),
        "calib_prev_file": os.path.basename(prev_file),
        # this round's timings re-expressed at the previous round's host
        # speed: compare THESE against prev queries for plan deltas
        "queries_calibrated": {
            n: round(t / ratio, 3) for n, t in queries.items()
        },
        "delta_vs_prev_pct": {
            n: round((t / ratio - prev_q[n]) / prev_q[n] * 100, 1)
            for n, t in queries.items()
            if prev_q.get(n)
        },
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

    # one untimed warm-up of the first benched query: absorbs the
    # JIT/codegen warm-up that used to land on kg_category_counts (the
    # r3 "first query after kg_build" noise case) — order of the timed
    # loop itself is pinned by the BENCH_QUERIES list
    KG_QUERIES[BENCH_QUERIES[0]](spark, SF_DIR).agg(F.count("*")).collect()

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
    slices = _scale_slices(spark)

    # sf1 decade-up point: the same frozen KG chain, same session, on
    # the 10x replica set — reported under "sf1" so round files carry
    # wall times one decade above the driver's largest scale.
    sf1: dict = {}
    if not os.path.isdir(SF1_DIR):
        # self-materializing: the replica set is a 10 s deterministic
        # build (hash-seeded, identical bytes every run), so a fresh
        # clone still produces the decade-up data point
        try:
            from tools.gen_testdata import build as _gen_sf1

            _gen_sf1(SF1_DIR)
        except Exception:
            pass
    if os.path.isdir(SF1_DIR) and os.path.realpath(
        SF1_DIR
    ) != os.path.realpath(SF_DIR):
        t0 = time.time()
        n1, e1 = get_kg(spark, SF1_DIR)
        sf1_build = time.time() - t0
        sf1_edges = e1.count()
        q1: dict[str, float] = {"kg_build": round(sf1_build, 3)}
        for name in BENCH_QUERIES:
            t0 = time.time()
            KG_QUERIES[name](spark, SF1_DIR).agg(F.count("*")).collect()
            q1[name] = round(time.time() - t0, 3)
        t0 = time.time()
        kg_openie_triples(spark, SF1_DIR).agg(F.count("*")).collect()
        q1["kg_openie_triples"] = round(time.time() - t0, 3)
        # r6: the FULL suite at the decade-up scale, not just the KG
        # chain — regressions in the dedup/ANN/graph families at the
        # scale that matters are tracked round-over-round (VERDICT r5
        # item 4). Same PIPELINE_BENCH dict as the sf0.1 suite so the
        # two sections stay name-comparable.
        for name, fn in PIPELINE_BENCH.items():
            t0 = time.time()
            fn(spark, SF1_DIR).agg(F.count("*")).collect()
            q1[name] = round(time.time() - t0, 3)
        sf1 = {
            "sf1": {
                "value": round(
                    sum(q1[n] for n in R01_HEADLINE_QUERIES), 3
                ),
                "suite_sec": round(sum(q1.values()), 3),
                "queries": q1,
                "n_edges": sf1_edges,
                "triples_per_sec": round(sf1_edges / sf1_build, 1),
                **_calibrated_vs_prev(q1, calib, section="sf1"),
            }
        }

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
                "slices": slices,
                **sf1,
                **_calibrated_vs_prev(queries, calib),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
