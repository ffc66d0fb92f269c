"""Generate PLANS.md — curated executed-plan evidence for the flagship
queries, with the scale property each plan is supposed to exhibit
stated next to the plan text. The same properties are pinned as
assertions in tests/test_plan_quality.py; this file is the
human-readable form.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def formatted(spark, df) -> str:
    """EXPLAIN FORMATTED: numbered operator tree + per-operator detail
    blocks — unlike the raw executedPlan string it never re-prints
    cached subtrees at arbitrary depths, so the evidence stays legible."""
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def trim(plan: str) -> str:
    """Keep the operator tree plus the detail blocks that carry the
    scale evidence (parquet scans: PushedFilters/ReadSchema; joins:
    build side)."""
    tree, _, details = plan.partition("\n\n(")
    keep = []
    if details:
        blocks = ("(" + details).split("\n\n")
        for b in blocks:
            head = b.splitlines()[0] if b.splitlines() else ""
            if re.search(r"^\(\d+\) (Scan parquet|BroadcastHashJoin|"
                         r"SortMergeJoin|Exchange|Window)", head):
                keep.append(b.strip())
    out = tree.strip()
    if keep:
        out += "\n\n" + "\n\n".join(keep)
    return out


def main() -> None:
    from kg_covid_19_spark.operators.similarity import emb_knn_bruteforce
    from kg_covid_19_spark.plans.pipeline import doc_mentions
    from kg_covid_19_spark.plans.queries import (
        kg_cooccurrence_counts,
        kg_druggable_two_hop,
        kg_linked_mentions_scored,
        kg_triangle_counts,
    )
    from kg_covid_19_spark.plans.relational import REL_QUERIES
    from kg_covid_19_spark.session import get_spark
    from kg_covid_19_spark.streaming.events import evt_asof_view_click

    spark = get_spark(app_name="plan-report", master="local[8]",
                      shuffle_partitions=8)

    def _grid(s):
        from kg_covid_19_spark.operators.multimodal import media_grid_neardup

        return media_grid_neardup(s, SF)

    def _strip(s):
        from kg_covid_19_spark.operators.dedup import doc_dup_span_strip

        return doc_dup_span_strip(s, SF)

    def _aa(s):
        from kg_covid_19_spark.plans.queries import kg_adamic_adar

        return kg_adamic_adar(s, SF)

    def _neardup(s):
        from kg_covid_19_spark.operators.similarity import (
            emb_cosine_neardup,
        )

        return emb_cosine_neardup(s, SF)

    def _deciles(s):
        from kg_covid_19_spark.functions.textstats import txt_len_deciles

        return txt_len_deciles(s, SF)

    sections = [
        (
            "Mention chain (doc_mentions)",
            "Single Arrow UDF evaluation (ArrowEvalPython ×1), ≤1 "
            "exchange — the corpus-scan hot path is a narrow map.",
            doc_mentions(spark, SF, langs=("en", "de", "fr", "es", "xx")),
        ),
        (
            "TPC-style scan pruning (rel_tpch_q1)",
            "Filter pushed into the parquet scan (DataFilters), unused "
            "columns absent from ReadSchema.",
            REL_QUERIES["rel_tpch_q1"](spark, SF),
        ),
        (
            "Dimension joins (rel_broadcast_dims)",
            "All dimension joins are BroadcastHashJoin — no "
            "SortMergeJoin, no fact-table shuffle.",
            REL_QUERIES["rel_broadcast_dims"](spark, SF),
        ),
        (
            "Co-occurrence counts (kg_cooccurrence_counts)",
            "No join of any kind: pairs expand row-locally from the "
            "per-doc mention array; the only exchange is the bounded "
            "pair-key aggregation.",
            kg_cooccurrence_counts(spark, SF),
        ),
        (
            "2-hop + drug constraint (kg_druggable_two_hop)",
            "Self-join on the materialized edge frame; drug dimension "
            "broadcast.",
            kg_druggable_two_hop(spark, SF),
        ),
        (
            "ANN top-k (emb_knn_bruteforce)",
            "Two-phase rank: phase 1 keyed by (partition id, query) "
            "spreads the exchange; only the pruned survivors reach the "
            "per-query window.",
            emb_knn_bruteforce(spark, SF),
        ),
        (
            "As-of join (evt_asof_view_click)",
            "One exchange, one Window, zero join operators — the "
            "windowed carry-forward form of the as-of join.",
            evt_asof_view_click(spark, SF),
        ),
        (
            "Degree-ordered triangles (kg_triangle_counts)",
            "Edges oriented low-degree→high-degree before the wedge "
            "join (CASE WHEN swap feeding deg_b/deg_c): the wedge "
            "intermediate is Σ out-deg² under the √m out-degree bound "
            "(O(m^1.5)), not Σ deg² — hubs never generate wedges.",
            kg_triangle_counts(spark, SF),
        ),
        (
            "Blocked fuzzy linking (kg_linked_mentions_scored)",
            "SymSpell ≤2-deletion block keys on both sides, broadcast "
            "HASH join on the key (no BroadcastNestedLoopJoin / "
            "CartesianProduct); levenshtein runs only on block-key "
            "collisions.",
            kg_linked_mentions_scored(spark, SF),
        ),
        (
            "Banded-multiprobe media near-dup (media_grid_neardup)",
            "Probe side = 81-row broadcast offsets frame joined per "
            "band (keeps the key build in one small codegen'd concat "
            "instead of 81 unrolled expressions that overflow the "
            "64 KB method limit); candidate join is a hash join on the "
            "cell key; the L1 verify is an explicit 8-term codegen sum, "
            "no higher-order functions on the hot path.",
            _grid(spark),
        ),
        (
            "Bucket-GEMM embedding near-dup (emb_cosine_neardup)",
            "The quadratic candidate set never reaches an exchange: "
            "vectors group once per (table, key) into an applyInPandas "
            "(FlatMapGroupsInPandas) whose in-core GEMM emits only "
            "near-threshold survivors; the dedup + order-exact verify "
            "downstream operate on that sparse remainder (r5 — the "
            "prior ids-only self-join shuffled 206M candidate rows at "
            "sf1).",
            _neardup(spark),
        ),
        (
            "Value-domain exact deciles (txt_len_deciles)",
            "No collect_list anywhere: a partial-agg (lang, n_chars) "
            "count collapses the corpus map-side, the window runs over "
            "distinct lengths only, and each decile position joins to "
            "its covering cumulative range (r5 — replaces the "
            "per-stratum array).",
            _deciles(spark),
        ),
        (
            "Span-removal rebuild (doc_dup_span_strip)",
            "ONE MapInPandas kernel (a deterministic pandas_udf here "
            "got duplicated by CollapseProject into two ArrowEvalPython "
            "evaluations); spans aggregate per doc and BROADCAST onto "
            "the corpus scan — the documents read feeds the kernel "
            "with zero exchange, and the rebuild never explodes tokens.",
            _strip(spark),
        ),
        (
            "Adamic-Adar with a shared log table (kg_adamic_adar)",
            "ln(deg) comes from a 1023-row broadcast table (the same "
            "integers the DuckDB oracle embeds as VALUES) — "
            "BroadcastHashJoin, no libm call anywhere in the plan.",
            _aa(spark),
        ),
    ]

    lines = [
        "# PLANS — executed-plan evidence for flagship queries",
        "",
        f"Generated by `python tools/plan_report.py {SF}`; the stated",
        "properties are also pinned as assertions in",
        "`tests/test_plan_quality.py`, so they cannot silently regress.",
        "Rendered with EXPLAIN FORMATTED (numbered tree + details); detail",
        "blocks are filtered to scans/joins/exchanges/windows. AQE prints",
        "each cached subtree's initial and final plan once, by design.",
        "",
    ]
    for title, claim, df in sections:
        lines += [f"## {title}", "", f"**Property:** {claim}", "",
                  "```", trim(formatted(spark, df)), "```", ""]
    open("PLANS.md", "w").write("\n".join(lines))
    print(f"PLANS.md written ({len(sections)} sections)")
    spark.stop()


if __name__ == "__main__":
    main()
