"""The reference's query surface, re-expressed as DataFrame plans.

kg-covid-19 ships 7 grlc/SPARQL templates run against Blazegraph
(queries/*.rq, kg_covid_19/query.py:8-41). Each becomes a DataFrame query
over the merged node/edge frames; each carries a DuckDB oracle (the full
pipeline CTE from dictionaries.kg_cte_sql plus the query's SELECT) so the
driver's correctness gate checks the *entire* pipeline semantics, not just
the final aggregation.

Mapping (SURVEY.md §2.3 J11-J13, §2.4 A7):

  query-01-bl-cat-counts.rq        → kg_category_counts
  query-02 (taxon/category select) → kg_protein_nodes
  query-03-…-interactors.rq        → kg_one_hop
  query-04 (2-hop)                 → kg_two_hop
  query-05 (druggable 2-hop)       → kg_druggable_two_hop
  query-06-provided_by_counts.rq   → kg_provided_by_counts
  query-07 (drug→target listing)   → kg_drug_mentions
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..dictionaries import kg_cte_sql, normalized_gazetteer
from ..sources.corpus import read_table, register_session_cache, table_source_key
from .pipeline import (
    get_kg,
    get_mention_arrays,
    get_mentions,
    pair_expand,
    web_extract_parity as _web_extract_parity,
)

# The hub entity for the hop queries — the reference's SARS-CoV-2 anchor
# (queries/query-03-sars-cov-2-interactors.rq) becomes our most-canonical
# disease CURIE (both 'hash' and 'merge' normalize onto it).
HUB = "MONDO:0005091"


def kg_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-01: COUNT(*) per Biolink category over merged nodes (A7)."""
    nodes, _ = get_kg(spark, sf_dir)
    return nodes.groupBy("category").agg(F.count("*").alias("n"))


def kg_protein_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-02 analog: category-filtered node selection."""
    nodes, _ = get_kg(spark, sf_dir)
    return nodes.filter(F.col("category") == "biolink:Protein").select(
        "id", "name", "category"
    )


def kg_one_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-03: 1-hop neighbours of the hub with OPTIONAL label (J11, J13).

    Edges are undirected co-occurrences stored once with subject < object,
    so the hop is the union of both orientations; the label join is
    left-outer (SPARQL OPTIONAL).
    """
    nodes, edges = get_kg(spark, sf_dir)
    cooc = edges.filter(F.col("predicate") == "biolink:correlated_with")
    nbrs = (
        cooc.filter(F.col("subject") == HUB).select(F.col("object").alias("id"))
        .unionAll(
            cooc.filter(F.col("object") == HUB).select(F.col("subject").alias("id"))
        )
        .distinct()
    )
    labels = F.broadcast(
        nodes.filter(F.col("category") != "biolink:Publication")
        .select("id", "name", "category")
    )
    return nbrs.join(labels, "id", "left").select("id", "name", "category")


def _undirected(cooc: DataFrame) -> DataFrame:
    return cooc.select("subject", "object").unionAll(
        cooc.select(F.col("object").alias("subject"), F.col("subject").alias("object"))
    )


_DEG_CACHE: dict[tuple, DataFrame] = register_session_cache({})
_UND_CACHE: dict[tuple, DataFrame] = register_session_cache({})


def _und_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both directions of the co-occurrence edge list, hash-partitioned
    on ``subject`` and persisted once per (application, source, input).

    r7: every iterative graph query (pagerank, BFS, components, label
    propagation, k-core, moments, wedge joins) re-derived this frame
    from the persisted KGX edge union EACH ROUND — at 32 shuffle
    partitions per branch that was ~130 scan tasks per round and the
    dominant cost of the whole family at bench scale (measured: 110
    stages / 8855 tasks for one 3-round BFS). One keyed exchange here
    (partition count = spark.sql.shuffle.partitions, the cluster knob,
    then AQE-coalesced by size) and every round reads a compact cached
    frame whose hashpartitioning(subject) the per-round joins and
    groupBys reuse outright (guide §2.4: establish the partitioning
    once). The frame is the dictionary-bounded pair set — KB-to-GB at
    any scale, never corpus-sized."""
    key = (*table_source_key(spark, sf_dir), "und_cooc")
    if key not in _UND_CACHE:
        _, edges = get_kg(spark, sf_dir)
        und = (
            _undirected(
                edges.filter(
                    F.col("predicate") == "biolink:correlated_with"
                )
            )
            .repartition(F.col("subject"))
            .persist()
        )
        und.count()
        _UND_CACHE[key] = und
    return _UND_CACHE[key]


def _cooc_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, deg) of the undirected co-occurrence graph, persisted once
    per (application, source, input) — five queries (triangles, capped
    common-neighbors, jaccard, degree moments, histogram) each need
    this table, and without the cache every one re-runs the union +
    aggregation (triangles three times over, once per self-join arm).
    The frame is |V| ≤ |dictionary| rows — broadcast-sized here,
    bounded by the entity vocabulary at any scale. On the distinct-pair
    edge set, countDistinct(object) == count(*) incident edges; the
    distinct form is used so the cache stays correct even if a
    multi-edge source is ever merged in."""
    key = table_source_key(spark, sf_dir)
    if key not in _DEG_CACHE:
        und = _und_cooc(spark, sf_dir)
        deg = und.groupBy(F.col("subject").alias("id")).agg(
            F.countDistinct("object").alias("deg")
        ).persist()
        deg.count()
        _DEG_CACHE[key] = deg
    return _DEG_CACHE[key]


def kg_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-04: 2-hop self-join — x co-occurs with HUB, y co-occurs with x
    (J12). Returns distinct (mid, far) pairs, far ∉ {HUB}."""
    und = _und_cooc(spark, sf_dir)
    hop1 = und.filter(F.col("subject") == HUB).select(F.col("object").alias("mid"))
    hop2 = und.withColumnRenamed("subject", "mid").withColumnRenamed("object", "far")
    return (
        hop1.join(hop2, "mid")
        .filter(F.col("far") != HUB)
        .select("mid", "far")
        .distinct()
    )


def kg_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction primitive over the co-occurrence graph: entity
    pairs ranked by common-neighbor count (triangle-style J12 extension
    — the self-join shuffles once on the shared-neighbor key and AQE
    handles the hub-key skew). Pairs with ≥2 common neighbors."""
    und = _und_cooc(spark, sf_dir)
    a = und.select(F.col("subject").alias("x"), F.col("object").alias("via"))
    b = und.select(F.col("subject").alias("y"), F.col("object").alias("via"))
    return (
        a.join(b, "via")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.countDistinct("via").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )


VIA_DEGREE_CAP = 50


def kg_common_neighbors_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor counts THROUGH LOW-DEGREE NEIGHBORS ONLY
    (deg(via) ≤ VIA_DEGREE_CAP) — the honest 100× form of the wedge
    join on a power-law graph (SCALE.md ceiling note): the candidate
    set is inherently d² pairs per shared neighbor, so a degree-d hub
    contributes d² wedge rows no ordering can remove. Capping the via
    degree bounds every neighbor's contribution at CAP² while staying
    EXACT for the long tail, which is where the link-prediction signal
    lives (a neighbor shared by everyone discriminates nothing — the
    same reasoning as Adamic-Adar's 1/log(deg) downweight taken to its
    limit). Deterministic: the cap is a pure degree predicate."""
    und = _und_cooc(spark, sf_dir)
    low = (
        _cooc_degrees(spark, sf_dir)
        .filter(F.col("deg") <= VIA_DEGREE_CAP)
        .select(F.col("id").alias("via"))
    )
    a = und.select(F.col("subject").alias("x"), F.col("object").alias("via"))
    b = und.select(F.col("subject").alias("y"), F.col("object").alias("via"))
    return (
        a.join(low, "via")  # prune hubs BEFORE the wedge self-join
        .join(b, "via")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.countDistinct("via").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )


def kg_jaccard_link_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction scoring: Jaccard of neighbor sets per candidate
    pair, in exact integer ppm (|N(x)∩N(y)| · 10⁶ div |N(x)∪N(y)| —
    float division would hash-diverge on engine rounding). Builds on
    the common-neighbors join; degrees come from one dictionary-bounded
    aggregation and join back on the pair endpoints."""
    und = _und_cooc(spark, sf_dir)
    deg = _cooc_degrees(spark, sf_dir)
    a = und.select(F.col("subject").alias("x"), F.col("object").alias("via"))
    b = und.select(F.col("subject").alias("y"), F.col("object").alias("via"))
    common = (
        a.join(b, "via")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.countDistinct("via").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    dx = deg.select(F.col("id").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("id").alias("y"), F.col("deg").alias("deg_y"))
    return (
        common.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "n_common",
            F.expr(
                "CAST(n_common * 1000000L div (deg_x + deg_y - n_common) "
                "AS LONG)"
            ).alias("jaccard_ppm"),
        )
    )


NBR_MH_SEEDS = 8   # minhash components per neighbor-set signature
NBR_MH_BANDS = 4   # bands of 2 → candidates share any band


def kg_jaccard_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set similarity by MINHASH SKETCH — the hub-scale path
    SCALE.md's common-neighbors ceiling promises ("or a sketch (minhash
    of neighbor sets)"), shipped as code: the exact wedge join is
    inherently Σdeg² through shared neighbors, while the sketch costs
    one dictionary-bounded aggregation per node (8 min(md5) partial
    aggs — a hub's million-edge neighbor list collapses map-side to
    ONE signature row) plus an LSH band join on signature fragments,
    independent of degree.

    Fully oracle-pairable, unlike most sketches: permutation-minhash
    via lexicographic min(md5(seed || ':' || neighbor)) is
    deterministic and engine-identical, and the similarity estimate
    (matching components · 10⁶ div seeds) is exact-integer — the
    accuracy-vs-exact-Jaccard bracket lives in pytest, while the
    cross-engine hash gates the construction itself."""
    und = _und_cooc(spark, sf_dir)
    sigs = und.groupBy(F.col("subject").alias("id")).agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{s}:"), F.col("object")))
            ).alias(f"h{s}")
            for s in range(NBR_MH_SEEDS)
        ]
    )
    width = NBR_MH_SEEDS // NBR_MH_BANDS
    band_keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[F.col(f"h{b * width + j}") for j in range(width)],
        )
        for b in range(NBR_MH_BANDS)
    ]
    kx = sigs.select(
        "id", F.explode(F.array(*band_keys)).alias("bk")
    )
    cand = (
        kx.select(F.col("id").alias("x"), "bk")
        .join(kx.select(F.col("id").alias("y"), "bk"), "bk")
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
    )
    sx = sigs.select(
        F.col("id").alias("x"),
        *[F.col(f"h{s}").alias(f"xh{s}") for s in range(NBR_MH_SEEDS)],
    )
    sy = sigs.select(
        F.col("id").alias("y"),
        *[F.col(f"h{s}").alias(f"yh{s}") for s in range(NBR_MH_SEEDS)],
    )
    n_match = None
    for s in range(NBR_MH_SEEDS):
        term = F.when(F.col(f"xh{s}") == F.col(f"yh{s}"), 1).otherwise(0)
        n_match = term if n_match is None else n_match + term
    return (
        cand.join(sx, "x")
        .join(sy, "y")
        .select(
            "x",
            "y",
            n_match.cast("int").alias("n_match"),
            F.expr(
                f"CAST(({'+'.join(f'(CASE WHEN xh{s} = yh{s} THEN 1 ELSE 0 END)' for s in range(NBR_MH_SEEDS))}) "
                f"* 1000000L div {NBR_MH_SEEDS} AS LONG)"
            ).alias("jaccard_est_ppm"),
        )
    )


def _jaccard_minhash_sql() -> str:
    width = NBR_MH_SEEDS // NBR_MH_BANDS
    mins = ", ".join(
        f"min(md5('{s}:' || object)) AS h{s}" for s in range(NBR_MH_SEEDS)
    )
    keys = ", ".join(
        "'" + str(b) + "|' || "
        + " || '|' || ".join(f"h{b * width + j}" for j in range(width))
        for b in range(NBR_MH_BANDS)
    )
    match_sum = " + ".join(
        f"(CASE WHEN sx.h{s} = sy.h{s} THEN 1 ELSE 0 END)"
        for s in range(NBR_MH_SEEDS)
    )
    return f"""und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
sigs AS (SELECT subject AS id, {mins} FROM und GROUP BY subject),
kx AS (SELECT id, unnest([{keys}]) AS bk FROM sigs),
cand AS (
  SELECT DISTINCT a.id AS x, b.id AS y
  FROM kx a JOIN kx b ON a.bk = b.bk AND a.id < b.id
)
SELECT c.x, c.y,
  CAST({match_sum} AS INTEGER) AS n_match,
  CAST(({match_sum}) * 1000000 // {NBR_MH_SEEDS} AS BIGINT)
    AS jaccard_est_ppm
FROM cand c
JOIN sigs sx ON c.x = sx.id
JOIN sigs sy ON c.y = sy.id"""


def kg_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link-prediction index in exact integer ppm:
    RA(x,y) = Σ_{via ∈ N(x)∩N(y)} 1/deg(via), the down-weights-hubs
    score Adamic-Adar approximates — chosen over AA precisely because
    1/deg is RATIONAL: `1000000 div deg` is the identical integer in
    both engines, while AA's 1/log(deg) would hash-diverge on libm
    rounding (the same reasoning as the jaccard_ppm and pagerank
    fixed-point). One wedge join (same shape as common-neighbors, same
    SCALE.md ceiling) + one broadcast-size degree join; the sum is a
    partial-agg groupBy over pair keys."""
    und = _und_cooc(spark, sf_dir)
    deg = _cooc_degrees(spark, sf_dir).select(
        F.col("id").alias("via"), F.col("deg").alias("via_deg")
    )
    a = und.select(F.col("subject").alias("x"), F.col("object").alias("via"))
    b = und.select(F.col("subject").alias("y"), F.col("object").alias("via"))
    return (
        a.join(b, "via")
        .filter(F.col("x") < F.col("y"))
        .join(deg, "via")
        .groupBy("x", "y")
        .agg(
            F.expr("CAST(sum(1000000L div via_deg) AS LONG)").alias(
                "ra_ppm"
            ),
            F.countDistinct("via").alias("n_common"),
        )
        .filter(F.col("n_common") >= 2)
    )


LP_ROUNDS = 3


def kg_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by semi-synchronous label propagation over
    the co-occurrence graph: LP_ROUNDS rounds of "adopt the most
    frequent neighbor label", every tie broken deterministically
    (count DESC, then label ASC) so the result is exact at any
    parallelism and in DuckDB — the usual LP randomness is replaced by
    a total order, the same discipline as the hash-min CC twin. Each
    round is one copartitioned join + two bounded groupBys (label
    counts collapse map-side; the argmax is a partial-agg min over a
    (−count, label) struct, not a window); per-round persist with the
    BFS/pagerank release discipline. Bounded rounds keep the oracle an
    unrolled CTE — the convergence-loop form would follow
    components_fixpoint's localCheckpoint pattern."""
    key = (*table_source_key(spark, sf_dir), "label_propagation")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _lp_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _lp_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_cooc(spark, sf_dir)
    return label_propagation_frame(und, LP_ROUNDS)


def label_propagation_frame(und: DataFrame, rounds: int) -> DataFrame:
    """(subject, object) undirected-edge frame → (id, community) after
    ``rounds`` deterministic LP rounds; frame-parametrized for the
    community-structure pytest."""
    # per-round localCheckpoint: see _components_build (r7)
    lbl = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        msgs = (
            und.join(lbl, und.object == lbl.id)
            .select(und.subject.alias("id"), "lbl")
        )
        cnt = msgs.groupBy("id", "lbl").agg(F.count("*").alias("c"))
        lbl = (
            cnt.groupBy("id")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"),
                             F.col("lbl").alias("l"))
                ).alias("b")
            )
            .select("id", F.col("b.l").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lbl.select("id", F.col("lbl").alias("community"))


def _lp_sql() -> str:
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        "p0 AS (SELECT DISTINCT subject AS id, subject AS lbl FROM und)",
    ]
    for k in range(LP_ROUNDS):
        parts.append(
            f"m{k} AS (SELECT und.subject AS id, p{k}.lbl, count(*) AS c "
            f"FROM und JOIN p{k} ON und.object = p{k}.id GROUP BY 1, 2)"
        )
        parts.append(
            f"p{k + 1} AS (SELECT id, lbl FROM ("
            f"SELECT id, lbl, row_number() OVER (PARTITION BY id "
            f"ORDER BY c DESC, lbl ASC) AS rn FROM m{k}) WHERE rn = 1)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, lbl AS community FROM p{LP_ROUNDS}"
    )


LP_FIXPOINT_UNROLL = 16  # oracle unroll depth; Spark raises past it


def kg_label_propagation_fixpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Convergence-loop twin of kg_label_propagation, with the
    oscillation hazard designed OUT rather than detected: plain
    semi-synchronous LP 2-cycles forever on bipartite ties (any
    pendant edge pair swaps labels every round), so a changed==0 loop
    would never terminate. The guard is MONOTONICITY — a node adopts
    the argmax-count neighbor label (count DESC, label ASC, the same
    total order as the bounded twin) only when that label is lexically
    SMALLER than its own. Every change strictly lowers a label over a
    finite domain, so convergence is guaranteed on any input; at the
    fixpoint the update is a no-op, so an oracle unrolled to
    LP_FIXPOINT_UNROLL rounds is EXACT whenever Spark converges within
    that many rounds — and Spark raises if it doesn't (the
    kcore_fixpoint discipline, never silent divergence). On degree-≤2
    stretches the rule degenerates to hash-min CC; inside dense
    communities the count-argmax dominates and community structure is
    preserved (barbell pytest). Per-round localCheckpoint(eager) cuts
    lineage — the unbounded-loop discipline."""
    key = (*table_source_key(spark, sf_dir), "label_propagation_fixpoint")
    if key not in _ITER_CACHE:
        und = _und_cooc(spark, sf_dir)
        _ITER_CACHE[key] = label_propagation_fixpoint_frame(und)
    return _ITER_CACHE[key]


def label_propagation_fixpoint_frame(und: DataFrame) -> DataFrame:
    und = und.persist()  # loop-invariant: joined every round
    lbl = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(LP_FIXPOINT_UNROLL):
        best = (
            und.join(lbl, und.object == lbl.id)
            .select(und.subject.alias("id"), "lbl")
            .groupBy("id", "lbl")
            .agg(F.count("*").alias("c"))
            .groupBy("id")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"),
                             F.col("lbl").alias("l"))
                ).alias("b")
            )
            .select("id", F.col("b.l").alias("best"))
        )
        new = (
            lbl.join(best, "id")
            .select("id", F.least("lbl", "best").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(lbl.withColumnRenamed("lbl", "old"), "id")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        lbl = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"monotone label propagation did not converge within "
            f"{LP_FIXPOINT_UNROLL} rounds — raise LP_FIXPOINT_UNROLL "
            f"(and the oracle unroll with it)"
        )
    und.unpersist()
    return lbl.select("id", F.col("lbl").alias("community"))


def _lp_fixpoint_sql() -> str:
    """Monotone-LP fixpoint as an over-unrolled CTE chain. AS
    MATERIALIZED is load-bearing: q{k} is referenced twice per round
    (message counts + the least() update), so default inlining would
    expand the 16-round chain 2^16-fold — the DuckDB analog of the
    lineage nesting the Spark side cuts with localCheckpoint."""
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        "q0 AS MATERIALIZED "
        "(SELECT DISTINCT subject AS id, subject AS lbl FROM und)",
    ]
    for k in range(LP_FIXPOINT_UNROLL):
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT und.subject AS id, q{k}.lbl, "
            f"count(*) AS c FROM und JOIN q{k} ON und.object = q{k}.id "
            f"GROUP BY 1, 2)"
        )
        parts.append(
            f"q{k + 1} AS MATERIALIZED (SELECT q{k}.id, "
            f"CASE WHEN b.lbl < q{k}.lbl THEN b.lbl ELSE q{k}.lbl END "
            f"AS lbl FROM q{k} JOIN (SELECT id, lbl FROM ("
            f"SELECT id, lbl, row_number() OVER (PARTITION BY id "
            f"ORDER BY c DESC, lbl ASC) AS rn FROM n{k}) WHERE rn = 1) b "
            f"ON q{k}.id = b.id)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, lbl AS community FROM q{LP_FIXPOINT_UNROLL}"
    )


def kg_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL clustering coefficient (transitivity) in exact integer
    ppm: C = 3·triangles / wedges, with 3·triangles read off the
    degree-oriented triangle frame (Σ per-node participations — each
    triangle is counted at its three corners) and wedges = Σ C(deg, 2)
    from one dictionary-bounded degree aggregate. deg·(deg−1) is
    always even, so the `div 2` is exact and both engines agree; the
    output is ONE scalar row — the canonical graph-cohesion readout
    next to kg_graph_stats. Scale shape: inherits the O(m^1.5)
    triangle bound; the wedge sum is a partial-agg scalar."""
    tri = kg_triangle_counts(spark, sf_dir)
    deg = _cooc_degrees(spark, sf_dir)
    t3 = tri.agg(F.sum("n_triangles").alias("t3"))
    w = deg.agg(F.expr("sum(deg * (deg - 1) div 2)").alias("w"))
    return t3.crossJoin(w).select(
        F.col("t3").cast("long").alias("triangle_participations"),
        F.col("w").cast("long").alias("n_wedges"),
        F.expr(
            "CAST(CASE WHEN w > 0 THEN t3 * 1000000L div w "
            "ELSE 0L END AS LONG)"
        ).alias("gcc_ppm"),
    )


AA_MAX_DEG = 1024


def _ln_ppm_table() -> list[tuple[int, int]]:
    """(deg, ln(deg)·1e6 truncated) for deg 2..AA_MAX_DEG — generated
    ONCE in Python and embedded literally in BOTH engines, so
    Adamic-Adar's 1/log weight is engine-parity by construction (the
    usual objection to AA — libm last-ulp divergence — vanishes when
    neither engine calls libm). deg 1 never appears: a degree-1 node
    cannot be a common neighbor."""
    import math

    return [(d, int(math.log(d) * 1_000_000)) for d in range(2, AA_MAX_DEG + 1)]


def kg_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction in exact integers:
    AA(x,y) = Σ_{via ∈ N(x)∩N(y)} 1/ln(deg(via)), here as
    Σ 1e12 div ln_ppm(deg) — the hub-down-weighting score
    kg_resource_allocation rationalizes; r4 ships the real thing by
    making the log a shared 1023-row integer table (broadcast join in
    Spark, literal VALUES in DuckDB) instead of a runtime libm call.
    Same wedge-join shape and SCALE.md ceiling as common-neighbors/RA.
    Vias with degree > AA_MAX_DEG are excluded IN BOTH ENGINES (inner
    join against the table): a 10⁶-degree hub's AA term is ≤ 1/ln(1024)
    ≈ 0.14 and carries ~no link signal — the same principled hub
    cutoff as kg_common_neighbors_capped."""
    und = _und_cooc(spark, sf_dir)
    deg = _cooc_degrees(spark, sf_dir).select(
        F.col("id").alias("via"), F.col("deg").alias("via_deg")
    )
    ln_tab = F.broadcast(
        spark.createDataFrame(_ln_ppm_table(), "via_deg long, ln_ppm long")
    )
    a = und.select(F.col("subject").alias("x"), F.col("object").alias("via"))
    b = und.select(F.col("subject").alias("y"), F.col("object").alias("via"))
    return (
        a.join(b, "via")
        .filter(F.col("x") < F.col("y"))
        .join(deg, "via")
        .join(ln_tab, "via_deg")
        .groupBy("x", "y")
        .agg(
            F.expr("CAST(sum(1000000000000L div ln_ppm) AS LONG)").alias(
                "aa_ppm"
            ),
            F.countDistinct("via").alias("n_common"),
        )
        .filter(F.col("n_common") >= 2)
    )


def _aa_sql() -> str:
    vals = ", ".join(f"({d}, {p})" for d, p in _ln_ppm_table())
    return f"""und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (
  SELECT object AS via, count(DISTINCT subject) AS via_deg
  FROM und GROUP BY object
),
ln_tab AS (SELECT * FROM (VALUES {vals}) t(via_deg, ln_ppm))
SELECT a.subject AS x, b.subject AS y,
       CAST(sum(1000000000000 // l.ln_ppm) AS BIGINT) AS aa_ppm,
       count(DISTINCT a.object) AS n_common
FROM und a
JOIN und b ON a.object = b.object
JOIN deg d ON a.object = d.via
JOIN ln_tab l ON d.via_deg = l.via_deg
WHERE a.subject < b.subject
GROUP BY a.subject, b.subject
HAVING count(DISTINCT a.object) >= 2"""


CC_ROUNDS = 3


def kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round hash-min connected components over the
    co-occurrence graph: after k rounds each node's label is the
    minimum entity id within its k-hop ball — the distributed CC
    primitive (one join + one min groupBy per round, the BFS persist
    discipline). Fixed CC_ROUNDS keeps the result deterministic and
    oracle-expressible (unrolled CTEs); production convergence loops
    until a round changes no label, with the same per-round plan. Note
    the north-star merge deliberately AVOIDS CC for canonicalization
    (prefix-priority dedup instead) — this is the analytics-side
    component labeling, not the merge path."""
    key = (*table_source_key(spark, sf_dir), "components")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _components_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _components_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-round localCheckpoint, not persist (r7): persist keeps the
    # analyzed plan nested round over round and Catalyst re-analysis
    # dominated the bounded loop at bench scale (the same measured
    # effect as the dedup cluster rounds); eager localCheckpoint
    # materializes AND flattens — the fixpoint twin's discipline.
    und = _und_cooc(spark, sf_dir)
    lbl = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CC_ROUNDS):
        nbr = (
            und.join(lbl, und.object == lbl.id)
            .select(und.subject.alias("id"), "lbl")
        )
        lbl = (
            lbl.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lbl.select("id", F.col("lbl").alias("component"))


CC_FIXPOINT_MAX_ROUNDS = 64  # safety cap ≫ any co-occurrence diameter


def kg_components_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-loop twin of kg_components: the SAME per-round plan
    (one join + one min groupBy, per-round persist/materialize/release)
    iterated UNTIL NO LABEL CHANGES rather than a fixed round count —
    the true connected components at any diameter, with a driver-side
    changed-row count (one extra copartitioned join + count per round,
    the standard distributed-fixpoint termination test) and a safety
    cap. Oracle-expressible without unrolling: hash-min CC's fixpoint
    is min-reachable-id, which DuckDB computes as a recursive-CTE
    transitive closure — so this query keeps a full value-hash gate,
    unlike sketches."""
    key = (*table_source_key(spark, sf_dir), "components_fixpoint")
    if key not in _ITER_CACHE:
        und = _und_cooc(spark, sf_dir)
        _ITER_CACHE[key] = components_fixpoint_frame(und)
    return _ITER_CACHE[key]


def components_fixpoint_frame(und: DataFrame) -> DataFrame:
    """(subject, object) undirected-edge frame → (id, component) at
    fixpoint. Frame-parametrized so the convergence pytest can drive a
    path graph LONGER than kg_components' fixed CC_ROUNDS."""
    und = und.persist()  # loop-invariant: joined every round
    # Per-round LINEAGE TRUNCATION, not just persist: a persisted frame
    # still nests the previous round's analyzed plan, and an
    # unknown-depth loop grows that nest until Catalyst itself OOMs
    # (observed on an 11-round path graph). localCheckpoint(eager)
    # materializes AND cuts the plan to a leaf — the unbounded-loop
    # discipline; a cluster deployment would use reliable checkpoint()
    # to a DFS dir for executor-loss tolerance.
    lbl = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CC_FIXPOINT_MAX_ROUNDS):
        nbr = (
            und.join(lbl, und.object == lbl.id)
            .select(und.subject.alias("id"), "lbl")
        )
        new = (
            lbl.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(lbl.withColumnRenamed("lbl", "old"), "id")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        lbl = new
        if changed == 0:
            break
    else:
        # Never return a non-converged labeling: the oracle computes
        # the true transitive-closure fixpoint, so a cap-exhausted
        # partial result would diverge SILENTLY. Same discipline as
        # kcore_fixpoint_frame.
        raise RuntimeError(
            f"hash-min components did not converge within "
            f"{CC_FIXPOINT_MAX_ROUNDS} rounds — graph diameter "
            f"exceeds the cap; raise CC_FIXPOINT_MAX_ROUNDS"
        )
    und.unpersist()
    return lbl.select("id", F.col("lbl").alias("component"))


def _components_fixpoint_sql() -> str:
    """Fixpoint CC as a DuckDB recursive CTE: component(v) = min id
    reachable from v (hash-min's fixpoint). UNION (not UNION ALL)
    dedups the frontier, so the closure terminates; the entity set is
    gazetteer-bounded, so the closure is tiny at any corpus scale —
    the ORACLE is allowed that luxury, the Spark plan is not."""
    return """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
cc_nodes AS (SELECT DISTINCT subject AS id FROM und),
reach AS (
  SELECT id, id AS r FROM cc_nodes
  UNION
  SELECT und.subject AS id, reach.r AS r
  FROM und JOIN reach ON und.object = reach.id
)
SELECT id, min(r) AS component FROM reach GROUP BY id"""


def _components_sql() -> str:
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        "l0 AS (SELECT DISTINCT subject AS id, subject AS lbl FROM und)",
    ]
    for k in range(CC_ROUNDS):
        parts.append(
            f"l{k + 1} AS (SELECT id, min(lbl) AS lbl FROM ("
            f"SELECT id, lbl FROM l{k} "
            f"UNION ALL "
            f"SELECT und.subject AS id, l{k}.lbl AS lbl "
            f"FROM und JOIN l{k} ON und.object = l{k}.id"
            f") GROUP BY id)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, lbl AS component FROM l{CC_ROUNDS}"
    )


KCORE_K = 2
KCORE_ROUNDS = 3


def kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (k=KCORE_K): repeatedly drop nodes
    of degree < k and the edges they carry — the densest-subgraph
    primitive next to components and triangles (peeling removes the
    noise fringe a co-occurrence graph accumulates). KCORE_ROUNDS
    fixed rounds keep it deterministic and oracle-expressible
    (unrolled CTEs); production iterates to fixpoint with the same
    per-round plan. Each round is one degree groupBy + two semi-joins
    (edges to surviving endpoints) with the BFS/pagerank persist
    discipline; output is the surviving nodes with their final
    residual degree."""
    key = (*table_source_key(spark, sf_dir), "kcore")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _kcore_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _kcore_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 0 reads the shared cached adjacency (never unpersisted here
    # — it is the session-scoped artifact other queries share)
    e = _und_cooc(spark, sf_dir)
    for _ in range(KCORE_ROUNDS):
        keep = (
            e.groupBy(F.col("subject").alias("id"))
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("id")
        )
        e = (
            e.join(keep.withColumnRenamed("id", "subject"), "subject",
                   "left_semi")
            .join(keep.withColumnRenamed("id", "object"), "object",
                  "left_semi")
            .select("subject", "object")
            .localCheckpoint(eager=True)  # see _components_build (r7)
        )
    return e.groupBy(F.col("subject").alias("id")).agg(
        F.count("*").alias("deg")
    )


KCORE_FIXPOINT_UNROLL = 16


def kg_kcore_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-loop twin of kg_kcore: peel degree-<k nodes until a
    round removes nothing — the true k-core at any peel depth. Same
    per-round plan (degree groupBy + two semi-joins), per-round
    localCheckpoint lineage truncation (the components_fixpoint OOM
    lesson), edge-count-based termination. Oracle contract is EXACT,
    not best-effort: peeling is monotone and idempotent at fixpoint,
    so an oracle unrolled to KCORE_FIXPOINT_UNROLL rounds equals the
    fixpoint whenever convergence takes ≤ that many rounds — and the
    Spark side RAISES if it ever needs more, so the two can never
    silently diverge (the synthetic worst case, a path peeling from
    both ends, is exercised in tests)."""
    key = (*table_source_key(spark, sf_dir), "kcore_fixpoint")
    if key not in _ITER_CACHE:
        und = _und_cooc(spark, sf_dir)
        _ITER_CACHE[key] = kcore_fixpoint_frame(und, KCORE_K)
    return _ITER_CACHE[key]


def kcore_fixpoint_frame(und: DataFrame, k: int) -> DataFrame:
    e = und.localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(KCORE_FIXPOINT_UNROLL):
        if n_edges == 0:
            break
        keep = (
            e.groupBy(F.col("subject").alias("id"))
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("id")
        )
        e = (
            e.join(keep.withColumnRenamed("id", "subject"), "subject",
                   "left_semi")
            .join(keep.withColumnRenamed("id", "object"), "object",
                  "left_semi")
            .select("subject", "object")
            .localCheckpoint(eager=True)
        )
        n_now = e.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    else:
        raise RuntimeError(
            f"k-core peeling did not converge within "
            f"{KCORE_FIXPOINT_UNROLL} rounds — raise "
            f"KCORE_FIXPOINT_UNROLL (and the oracle unroll with it)"
        )
    return e.groupBy(F.col("subject").alias("id")).agg(
        F.count("*").alias("deg")
    )


def _kcore_fixpoint_sql() -> str:
    parts = [
        """c0 AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)"""
    ]
    # AS MATERIALIZED is load-bearing: each c_{r+1} references c_r
    # three times (FROM + two IN subqueries via k_r), so DuckDB's
    # default CTE inlining would expand the 16-round chain to 3^16
    # plan copies — the same lineage-nesting blowup the Spark side
    # solves with localCheckpoint (it died as "too many open files")
    for r in range(KCORE_FIXPOINT_UNROLL):
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT subject AS id FROM c{r} "
            f"GROUP BY subject HAVING count(*) >= {KCORE_K})"
        )
        parts.append(
            f"c{r + 1} AS MATERIALIZED (SELECT subject, object FROM c{r} "
            f"WHERE subject IN (SELECT id FROM k{r}) "
            f"AND object IN (SELECT id FROM k{r}))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT subject AS id, count(*) AS deg "
        f"FROM c{KCORE_FIXPOINT_UNROLL} GROUP BY subject"
    )


def _kcore_sql() -> str:
    parts = [
        """c0 AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)"""
    ]
    for r in range(KCORE_ROUNDS):
        parts.append(
            f"k{r} AS (SELECT subject AS id FROM c{r} "
            f"GROUP BY subject HAVING count(*) >= {KCORE_K})"
        )
        parts.append(
            f"c{r + 1} AS (SELECT subject, object FROM c{r} "
            f"WHERE subject IN (SELECT id FROM k{r}) "
            f"AND object IN (SELECT id FROM k{r}))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT subject AS id, count(*) AS deg FROM c{KCORE_ROUNDS} "
        f"GROUP BY subject"
    )


def kg_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-occurrence graph (A5/A8 extension):
    how many entities have each undirected degree. Two dictionary-
    bounded aggregations (the first served by the shared degree
    cache) — the histogram never exceeds |V| rows."""
    degrees = _cooc_degrees(spark, sf_dir).select(
        "id", F.col("deg").alias("degree")
    )
    return degrees.groupBy("degree").agg(F.count("*").alias("n_entities"))


def kg_druggable_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-05: the 2-hop restricted to drug endpoints (the reference's
    druggable-genome TDL='Tclin' constraint becomes category='biolink:Drug')."""
    nodes, _ = get_kg(spark, sf_dir)
    und = _und_cooc(spark, sf_dir)
    hop1 = und.filter(F.col("subject") == HUB).select(F.col("object").alias("mid"))
    hop2 = und.withColumnRenamed("subject", "mid").withColumnRenamed("object", "far")
    drugs = F.broadcast(
        nodes.filter(F.col("category") == "biolink:Drug")
        .select(F.col("id").alias("far"), F.col("name").alias("drug_name"))
    )
    return (
        hop1.join(hop2, "mid")
        .filter(F.col("far") != HUB)
        .join(drugs, "far")
        .select("mid", "far", "drug_name")
        .distinct()
    )


def kg_provided_by_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-06: COUNT per provided_by over merged edges, ORDER BY DESC."""
    _, edges = get_kg(spark, sf_dir)
    return (
        edges.groupBy("provided_by")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "provided_by")
    )


def kg_drug_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query-07 analog: documents mentioning drug entities, with labels."""
    nodes, edges = get_kg(spark, sf_dir)
    m = edges.filter(F.col("predicate") == "biolink:mentions")
    drugs = F.broadcast(
        nodes.filter(F.col("category") == "biolink:Drug")
        .select(F.col("id").alias("object"), F.col("name").alias("drug_name"))
    )
    return m.join(drugs, "object").select(
        F.col("subject").alias("doc"), F.col("object").alias("drug"), "drug_name"
    )


def kg_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity document frequency — the A3/A5 degree-count analog."""
    m = get_mentions(spark, sf_dir)
    return m.groupBy("curie").agg(F.countDistinct("doc_id").alias("n_docs"))


def _pair_counts(pm: DataFrame) -> DataFrame:
    """Row-local pair expansion + bounded groupBy — the ONE definition
    of pair-support counting, shared by the full and incremental
    queries so their 'incremental == full' contract cannot drift."""
    return (
        pm.select(F.explode(pair_expand(F.col("curies"))).alias("p"))
        .groupBy(
            F.col("p.s").alias("subject"), F.col("p.o").alias("object")
        )
        .agg(F.count("*").alias("n_docs"))
    )


_PAIRC_CACHE: dict[tuple, DataFrame] = register_session_cache({})


def _cooc_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (subject, object, n_docs) pair-support table, session-cached
    (r7): co-occurrence counts, lift, the walk adjacency and the
    weighted BFS all start from this ≤|dictionary|²-row frame, and each
    re-ran the corpus-wide pair expansion + groupBy without it."""
    key = table_source_key(spark, sf_dir)
    if key not in _PAIRC_CACHE:
        pc = _pair_counts(get_mention_arrays(spark, sf_dir)).persist()
        pc.count()
        _PAIRC_CACHE[key] = pc
    return _PAIRC_CACHE[key]


def kg_cooccurrence_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair co-occurrence support counts (A2 with counts kept).

    Pairs are expanded row-locally from each document's sorted mention
    array (plans/pipeline.pair_expand) — NOT via a mentions self-join on
    doc_id, which at 100 TB would shuffle the whole corpus on a
    corpus-sized key. The only shuffle is the final groupBy over
    ≤|dictionary|² pair keys, collapsed map-side by partial aggregation."""
    return _cooc_pair_counts(spark, sf_dir)


def kg_cooc_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift per co-occurrence pair — the edge-weighting
    step that separates signal pairs from chance pairs before a
    co-occurrence edge enters the KG (reference analog: the SciBite
    co-occurrence edges ship raw counts; production curation ranks
    them by association strength). lift = P(a,b) / (P(a)·P(b)) over
    document space, emitted as exact integer ppm
    (n_ab · N · 10⁶ div (df_a · df_b)) so the score is
    engine-reproducible — the same no-libm discipline as jaccard_ppm
    and txt_bigram_lm (PMI is log(lift); the log is left to the
    consumer, monotone in this score).

    100 TB shape: pair supports come from the row-local pair
    expansion (no corpus self-join); per-entity document frequencies
    are a dictionary-bounded aggregate, broadcast to the pair frame;
    N is a 1-row broadcast crossJoin (the sanctioned kind). At
    extreme document counts (N > ~3·10⁹ with dictionary-scale
    supports) the int64 product needs the DECIMAL(38,0) widening
    pagerank already uses.

    r7: kg_assoc_topk used to reference this frame through BOTH arms of
    an endpoint union, re-executing the dfreq/n_total aggregations and
    the three joins twice; it now expands both directions row-locally
    (explode of two structs), so the lift plan executes once per
    consumer and needs no persist."""
    return _cooc_lift_build(spark, sf_dir)


def _cooc_lift_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _cooc_pair_counts(spark, sf_dir)
    m = get_mentions(spark, sf_dir)
    dfreq = m.groupBy("curie").agg(F.countDistinct("doc_id").alias("df"))
    n_total = m.agg(F.countDistinct("doc_id").alias("n_total"))
    return (
        pairs.join(
            F.broadcast(
                dfreq.select(
                    F.col("curie").alias("subject"), F.col("df").alias("df_s")
                )
            ),
            "subject",
        )
        .join(
            F.broadcast(
                dfreq.select(
                    F.col("curie").alias("object"), F.col("df").alias("df_o")
                )
            ),
            "object",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "subject",
            "object",
            "n_docs",
            "df_s",
            "df_o",
            F.expr(
                "n_docs * n_total * 1000000L div (df_s * df_o)"
            ).alias("lift_ppm"),
        )
    )


ASSOC_TOPK = 3


def kg_assoc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-graph sparsification: keep each entity's top-K
    strongest co-occurrence partners by lift — the kNN-graph rule a
    production KG applies before densely-mentioned entities drown the
    edge table (a threshold rule goes vacuous as N grows and lift
    concentrates at 1.0; top-K is scale-invariant by construction).
    Each undirected pair is evaluated from BOTH endpoints, so an edge
    survives if either side elects it. Deterministic total order:
    (lift_ppm desc, n_docs desc, partner asc).

    100 TB shape: the window partitions the PAIR frame by entity —
    key space ≤ |dictionary|, rows ≤ |dictionary|², both bounded;
    the corpus never enters the window. Hot entities (the planted
    hub) hold at most |dictionary|−1 rows per partition."""
    lift = kg_cooc_lift(spark, sf_dir)
    # both directions via a row-local explode of two structs (r7): the
    # former two-arm union referenced the lift plan twice, re-running
    # its aggregations and joins per arm — this form evaluates lift
    # once, with the identical row multiset
    both = lift.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("subject").alias("entity"),
                    F.col("object").alias("partner"),
                    F.col("n_docs").alias("n_docs"),
                    F.col("lift_ppm").alias("lift_ppm"),
                ),
                F.struct(
                    F.col("object").alias("entity"),
                    F.col("subject").alias("partner"),
                    F.col("n_docs").alias("n_docs"),
                    F.col("lift_ppm").alias("lift_ppm"),
                ),
            )
        ).alias("e")
    ).select("e.entity", "e.partner", "e.n_docs", "e.lift_ppm")
    w = Window.partitionBy("entity").orderBy(
        F.desc("lift_ppm"), F.desc("n_docs"), F.asc("partner")
    )
    return (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ASSOC_TOPK)
        .select("entity", "partner", "n_docs", "lift_ppm", "rk")
    )


def kg_degree_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-assortativity SUFFICIENT STATISTICS in exact integers:
    over all directed edge slots (u→v) of the undirected co-occurrence
    graph, the sums m, Σdu, Σdv, Σdu·dv, Σdu², Σdv² — everything
    Pearson's r needs, emitted as one exact row. The correlation
    itself is a downstream float division (engine-dependent rounding),
    so the engine emits the moments and leaves the last division to
    the consumer — the same exactness discipline as jaccard_ppm and
    pagerank. One degree aggregation + one edge join + a single-row
    total aggregation (partial-agg collapsed map-side)."""
    und = _und_cooc(spark, sf_dir)
    deg = _cooc_degrees(spark, sf_dir)
    du = deg.select(F.col("id").alias("subject"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("object"), F.col("deg").alias("dv"))
    return (
        und.join(du, "subject")
        .join(dv, "object")
        .agg(
            F.count("*").alias("m"),
            F.sum("du").cast("long").alias("sum_du"),
            F.sum("dv").cast("long").alias("sum_dv"),
            F.sum(F.col("du") * F.col("dv")).cast("long").alias("sum_dudv"),
            F.sum(F.col("du") * F.col("du")).cast("long").alias("sum_du2"),
            F.sum(F.col("dv") * F.col("dv")).cast("long").alias("sum_dv2"),
        )
    )


DELTA_MOD = 10  # doc_id % DELTA_MOD == 0 plays the freshly-arrived slice


def kg_cooc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance form of kg_cooccurrence_counts: the
    corpus is split into a BASE slice and a DELTA slice (a day's new
    crawl), pair counts are aggregated per slice, and the maintained
    view is the key-wise SUM merge — the additive-aggregate refresh a
    10^12-doc pipeline runs daily instead of recomputing the world.
    The DuckDB oracle is the plain FULL-corpus count: count(*) is a
    commutative monoid over disjoint slices, so incremental == full is
    the correctness contract, checked by hash every round. The merge
    groupBy is the same bounded ≤|dict|² key space; each slice's pair
    expansion is the row-local (no doc_id self-join) plan of the full
    query."""
    pm = get_mention_arrays(spark, sf_dir)
    base = _pair_counts(pm.filter(F.col("doc_id") % DELTA_MOD != 0))
    delta = _pair_counts(pm.filter(F.col("doc_id") % DELTA_MOD == 0))
    return (
        base.unionByName(delta)
        .groupBy("subject", "object")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
    )


def kg_lift_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the DERIVED score, not just the
    counts: pair supports, per-entity document frequencies, and the
    corpus size are each maintained as key-wise SUM merges of BASE-
    and DELTA-slice aggregates (every input to lift is a commutative
    monoid over disjoint doc slices), then lift_ppm is recomputed
    from the maintained sufficient statistics. The DuckDB oracle is
    the plain full-corpus kg_cooc_lift — incremental == full is the
    contract, hash-checked. This is the refresh a daily crawl runs:
    O(delta) new aggregation work + a dictionary-bounded merge;
    the division is the only non-additive step and it happens LAST,
    on the merged statistics (re-deriving scores from maintained
    sums is what makes the score refreshable at all)."""
    pm = get_mention_arrays(spark, sf_dir)
    m = get_mentions(spark, sf_dir)
    is_delta = F.col("doc_id") % DELTA_MOD == 0

    pairs = (
        _pair_counts(pm.filter(~is_delta))
        .unionByName(_pair_counts(pm.filter(is_delta)))
        .groupBy("subject", "object")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
    )

    def _dfreq(side):
        return side.groupBy("curie").agg(
            F.countDistinct("doc_id").alias("df")
        )

    dfreq = (
        _dfreq(m.filter(~is_delta))
        .unionByName(_dfreq(m.filter(is_delta)))
        .groupBy("curie")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    n_total = (
        m.filter(~is_delta)
        .agg(F.countDistinct("doc_id").alias("n"))
        .unionByName(
            m.filter(is_delta).agg(F.countDistinct("doc_id").alias("n"))
        )
        .agg(F.sum("n").cast("long").alias("n_total"))
    )
    return (
        pairs.join(
            F.broadcast(
                dfreq.select(
                    F.col("curie").alias("subject"), F.col("df").alias("df_s")
                )
            ),
            "subject",
        )
        .join(
            F.broadcast(
                dfreq.select(
                    F.col("curie").alias("object"), F.col("df").alias("df_o")
                )
            ),
            "object",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "subject",
            "object",
            "n_docs",
            "df_s",
            "df_o",
            F.expr(
                "n_docs * n_total * 1000000L div (df_s * df_o)"
            ).alias("lift_ppm"),
        )
    )


WALK_STEPS = 3   # transitions per walk (walk visits WALK_STEPS+1 nodes)
WALKS_PER_NODE = 2


def kg_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic node2vec-style walk corpus over the co-occurrence
    graph — the training-data export for graph-embedding models, made
    reproducible by replacing the RNG with the engine's shared hash
    gate (functions/hashing.py): at each step the next neighbor is
    adjacency index md5('walk|start|walk_id|step|cur') mod deg(cur),
    over a canonically ordered adjacency (row_number by neighbor id).
    A pure function of the graph — identical across runs, engines,
    parallelism levels — so the walk corpus itself is hash-checked
    against the DuckDB oracle, not just row-counted.

    100 TB shape: each unrolled step is one equi-join of the walk
    frontier (|nodes|·WALKS_PER_NODE rows) against the adjacency on
    the current node — frontier-sized shuffles, never edge-squared;
    the adjacency with its (idx, deg) annotation is built once by a
    single window over the edge list and would be a persisted/bucketed
    artifact keyed by node in production, exactly like the incremental
    dedup index.

    r7: the finished walk corpus is itself session-cached — it is the
    bounded (|nodes|·WALKS_PER_NODE·(WALK_STEPS+1))-row export that
    kg_walk_skipgrams immediately self-joins; without the cache the
    skip-gram query re-executed the whole unrolled step chain twice
    (once per join arm)."""
    out_key = (*table_source_key(spark, sf_dir), "walk_corpus")
    if out_key in _ITER_CACHE:
        return _ITER_CACHE[out_key]

    from ..functions.hashing import hash_mod

    # the annotated adjacency is referenced once per unrolled step;
    # without pinning it, the corpus-scale pair expansion upstream
    # re-executes WALK_STEPS+1 times (no ReusedExchange across the
    # step joins) — persist the dictionary-bounded frame once, the
    # _ITER_CACHE discipline the other iterative queries use
    key = (*table_source_key(spark, sf_dir), "walk_adjacency")
    if key not in _ITER_CACHE:
        und = _cooc_undirected(spark, sf_dir)
        w = Window.partitionBy("u").orderBy("v")
        a = und.select(
            "u",
            "v",
            (F.row_number().over(w) - 1).alias("idx"),
            F.count("*").over(Window.partitionBy("u")).alias("deg"),
        ).persist()
        a.count()
        _ITER_CACHE[key] = a
    adj = _ITER_CACHE[key]
    starts = adj.select("u").distinct()
    frontier = starts.crossJoin(
        spark.range(WALKS_PER_NODE).select(
            F.col("id").cast("int").alias("walk_id")
        )
    ).select(F.col("u").alias("start"), "walk_id")
    out = frontier.select(
        "start", "walk_id", F.lit(0).alias("step"),
        F.col("start").alias("node"),
    )
    cur = frontier.withColumn("cur", F.col("start"))
    for s in range(1, WALK_STEPS + 1):
        key = F.concat_ws(
            "|", "start", F.col("walk_id").cast("string"),
            F.lit(str(s)), "cur",
        )
        a = adj.alias(f"a{s}")
        cur = (
            cur.join(
                a,
                (F.col(f"a{s}.u") == F.col("cur"))
                & (
                    F.col(f"a{s}.idx")
                    == hash_mod("walk", key, F.col(f"a{s}.deg"))
                ),
            )
            .select("start", "walk_id", F.col(f"a{s}.v").alias("cur"))
            # checkpoint each step (r7): step s is read by BOTH the
            # s+1 frontier join and the output union — without the
            # cut, step s's join chain re-executed once per later
            # step (triangular recompute) and the union's analysis
            # re-nested every step's plan
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            cur.select(
                "start", "walk_id", F.lit(s).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = out.persist()
    out.count()
    _ITER_CACHE[out_key] = out
    return out


SKIPGRAM_WINDOW = 2


def kg_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from the deterministic walk corpus —
    the final export an embedding trainer actually consumes: within
    each walk, every ordered (center, context) node pair at step
    distance 1..SKIPGRAM_WINDOW, aggregated to pair counts. Because
    the walks are RNG-free, the full training-pair distribution is
    engine-reproducible and hash-checked, not sampled.

    100 TB shape: the self-join keys on (start, walk_id) — each group
    is one walk of WALK_STEPS+1 rows, so the join fans out a bounded
    (WALK_STEPS+1)·2·SKIPGRAM_WINDOW pairs per walk; the final count
    groupBy is over the ≤|dict|² pair key space, partial-combined
    map-side."""
    w = kg_random_walks(spark, sf_dir)
    a, b = w.alias("a"), w.alias("b")
    dist = F.abs(F.col("a.step") - F.col("b.step"))
    return (
        a.join(
            b,
            (F.col("a.start") == F.col("b.start"))
            & (F.col("a.walk_id") == F.col("b.walk_id"))
            & (dist >= 1)
            & (dist <= SKIPGRAM_WINDOW),
        )
        .groupBy(
            F.col("a.node").alias("center"), F.col("b.node").alias("context")
        )
        .agg(F.count("*").alias("n"))
    )


def _cooc_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both directions of the distinct co-occurrence pair set."""
    pairs = _cooc_pair_counts(spark, sf_dir).select(
        "subject", "object"
    )
    return pairs.select(
        F.col("subject").alias("u"), F.col("object").alias("v")
    ).unionByName(
        pairs.select(F.col("object").alias("u"), F.col("subject").alias("v"))
    )


BFS_ROUNDS = 3

# final frames of the iterative queries, persisted once per
# (application, source, input, query) — the get_kg keyed-cache pattern.
# The loop bodies already unpersist superseded rounds; this bounds the
# one frame that outlives the loop, so check sweeps that re-invoke
# these queries reuse the result instead of pinning a fresh copy each
# time (the cache-accumulation hazard ADVICE r2 flagged).
# TIMING CAVEAT: a second in-process invocation is a cache hit (~0 s).
# bench.py times each query exactly once per fresh process, so its
# numbers are true build timings; any harness that loops the suite
# in one application must use fresh processes per iteration (as
# tools/scaling.py does) or its iterative-query timings measure a
# dict lookup.
_ITER_CACHE: dict[tuple, DataFrame] = register_session_cache({})


def kg_hub_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached wrapper — see _hub_distances_build."""
    key = (*table_source_key(spark, sf_dir), "hub_distances")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _hub_distances_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _hub_distances_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path lengths from the hub over the co-occurrence
    graph, bounded to BFS_ROUNDS hops — the iterative-traversal
    counterpart of kg_pagerank (same per-round persist discipline, same
    unrolled-CTE oracle). Integer distances only: nothing float to
    diverge. Each round is one join on the frontier key + one min
    groupBy; unreached nodes are absent (no infinity sentinel)."""
    und = _und_cooc(spark, sf_dir)
    # per-round localCheckpoint: see _components_build (r7)
    dist = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .filter(F.col("id") == HUB)
        .select("id", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(BFS_ROUNDS):
        reached = (
            und.join(dist, und.subject == dist.id)
            .select(
                F.col("object").alias("id"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def _bfs_sql() -> str:
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        f"d0 AS (SELECT '{HUB}' AS id, 0 AS dist "
        f"WHERE EXISTS (SELECT 1 FROM und WHERE subject = '{HUB}'))",
    ]
    for k in range(BFS_ROUNDS):
        parts.append(
            f"d{k + 1} AS (SELECT id, min(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{k} "
            f"UNION ALL "
            f"SELECT und.object AS id, d{k}.dist + 1 AS dist "
            f"FROM und JOIN d{k} ON und.subject = d{k}.id"
            f") GROUP BY id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, dist FROM d{BFS_ROUNDS}"


def kg_weighted_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached wrapper — see _weighted_distances_build."""
    key = (*table_source_key(spark, sf_dir), "weighted_distances")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _weighted_distances_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _weighted_distances_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths from the hub — the min-plus
    twin of kg_hub_distances. Edge cost is 1_000_000 div n_docs over
    the co-occurrence support counts (strong associations are cheap to
    traverse), all-integer so nothing float can diverge between
    engines; the contract is "minimum total cost using at most
    BFS_ROUNDS hops", which the unrolled-CTE oracle states exactly.

    Scale shape: identical to the BFS — each round is one join on the
    frontier key plus one min groupBy, per-round persist/unpersist so
    lineage stays flat; the weight column rides the same exchange the
    unweighted edge join already pays (no extra shuffle for weights)."""
    cc = kg_cooccurrence_counts(spark, sf_dir)
    w = cc.select(
        "subject", "object", F.expr("1000000L div n_docs").alias("w")
    )
    und = w.unionByName(
        w.select(
            F.col("object").alias("subject"),
            F.col("subject").alias("object"),
            "w",
        )
    )
    # per-round localCheckpoint: see _components_build (r7)
    dist = (
        und.select(F.col("subject").alias("id"))
        .distinct()
        .filter(F.col("id") == HUB)
        .select("id", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(BFS_ROUNDS):
        reached = und.join(dist, und.subject == dist.id).select(
            F.col("object").alias("id"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def _weighted_bfs_sql() -> str:
    parts = [
        """wcnt AS (
  SELECT a.curie AS s, b.curie AS o, count(*) AS n
  FROM mentions a JOIN mentions b
    ON a.doc_id = b.doc_id AND a.curie < b.curie
  GROUP BY a.curie, b.curie
)""",
        """wund AS (
  SELECT s AS subject, o AS object, 1000000 // n AS w FROM wcnt
  UNION ALL
  SELECT o AS subject, s AS object, 1000000 // n AS w FROM wcnt
)""",
        f"d0 AS (SELECT '{HUB}' AS id, CAST(0 AS BIGINT) AS dist "
        f"WHERE EXISTS (SELECT 1 FROM wund WHERE subject = '{HUB}'))",
    ]
    for k in range(BFS_ROUNDS):
        parts.append(
            f"d{k + 1} AS (SELECT id, min(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{k} "
            f"UNION ALL "
            f"SELECT wund.object AS id, d{k}.dist + wund.w AS dist "
            f"FROM wund JOIN d{k} ON wund.subject = d{k}.id"
            f") GROUP BY id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, dist FROM d{BFS_ROUNDS}"


def kg_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity triangle participation over the co-occurrence graph —
    the clustering-structure metric next to degree (A5) and common
    neighbors (J12 extension).

    Edges are oriented lower-degree → higher-degree endpoint (ties by
    id) before enumeration — the standard degree-ordering refinement.
    Under id-ordering a degree-d hub contributes d² wedge rows (Σ deg²
    ≈ quadratic in the hub degree on a power-law web graph); under
    degree-ordering every out-neighborhood is ≤ O(√m) amortized, so
    the wedge intermediate is O(m^1.5) worst case and far smaller in
    practice — hubs sit on the *closing* side of the join, never the
    wedge-generating side. Each triangle {a,b,c} with a<b<c in
    (degree, id) order is produced exactly once as a→b, a→c wedge
    closed by b→c. The triangle set is orientation-invariant, so the
    DuckDB oracle (plain a<b<c id-ordering) is unchanged."""
    _, edges = get_kg(spark, sf_dir)
    e = (
        edges.filter(F.col("predicate") == "biolink:correlated_with")
        .select("subject", "object")
    )
    deg = _cooc_degrees(spark, sf_dir)  # shared persisted (id, deg)
    return triangle_counts_frame(e, deg, degree_ordered=True)


def triangle_counts_frame(
    e: DataFrame, deg: DataFrame, degree_ordered: bool = True
) -> DataFrame:
    """Edge-frame-parametrized triangle core: ``e`` is one row per
    undirected edge (either direction), ``deg`` is (id, deg).

    degree_ordered=True is the production orientation (what
    kg_triangle_counts uses); degree_ordered=False orients by id alone
    — same output, but the wedge intermediate is Σ out-deg², which a
    low-id hub turns quadratic. The bench's planted-hub slice times
    the two side by side so the r3 refactor's win is a measured number
    at its design point, not prose."""
    tri = triangles_frame(e, deg, degree_ordered=degree_ordered)
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )


def triangles_frame(
    e: DataFrame, deg: DataFrame, degree_ordered: bool = True
) -> DataFrame:
    """Triangle ENUMERATION — one (a, b, c) row per triangle, members
    in wedge order (a = wedge center, so a/b/c is NOT id-sorted under
    degree ordering; consumers id-sort the member pairs they need).
    This is triangle_counts_frame's plan minus the final corner
    explode, factored out so edge-level consumers (support, truss)
    reuse the enumeration without forcing the per-node aggregate.
    degree_ordered=True is the production orientation (O(m^1.5) wedge
    bound); False orients by id alone — same triangle set, but a
    low-id hub turns the wedge intermediate quadratic (the bench's
    planted-hub slice measures the gap)."""
    ed = e.join(
        deg.select(F.col("id").alias("subject"), F.col("deg").alias("ds")),
        "subject",
    ).join(
        deg.select(F.col("id").alias("object"), F.col("deg").alias("do")),
        "object",
    )
    if degree_ordered:
        fwd = (F.col("ds") < F.col("do")) | (
            (F.col("ds") == F.col("do"))
            & (F.col("subject") < F.col("object"))
        )
    else:
        fwd = F.col("subject") < F.col("object")
    o = ed.select(
        F.when(fwd, F.col("subject")).otherwise(F.col("object")).alias("src"),
        F.when(fwd, F.col("object")).otherwise(F.col("subject")).alias("dst"),
        F.when(fwd, F.col("do")).otherwise(F.col("ds")).alias("deg_dst"),
        F.when(fwd, F.col("object")).otherwise(F.col("subject")).alias("id_dst"),
    )
    if degree_ordered:
        later = (F.col("deg_b") < F.col("deg_c")) | (
            (F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c"))
        )
        ord_col = "deg_dst"
    else:
        later = F.col("b") < F.col("c")
        ord_col = "id_dst"
    w1 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col(ord_col).alias("deg_b"),
    )
    w2 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col(ord_col).alias("deg_c"),
    )
    wedges = w1.join(w2, "a").filter(later)
    return wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")


def _edge_support_frame(e: DataFrame) -> DataFrame:
    """(x, y, support) for an id-ordered undirected edge frame ``e``
    (subject < object, one row per edge): the number of triangles each
    edge closes, 0-support edges included. Triangles enumerate degree-
    oriented (hub-safe on a power-law web graph); the three member
    pairs id-sort back with least/greatest — pure column algebra —
    then a partial-agg count joins LEFT onto the edge list so
    triangle-free edges surface with support 0 instead of vanishing."""
    deg = (
        _undirected(e)
        .groupBy(F.col("subject").alias("id"))
        .agg(F.count("*").alias("deg"))
    )
    tri = triangles_frame(e, deg)
    tedges = None
    for u, v in (("a", "b"), ("a", "c"), ("b", "c")):
        part = tri.select(
            F.least(F.col(u), F.col(v)).alias("x"),
            F.greatest(F.col(u), F.col(v)).alias("y"),
        )
        tedges = part if tedges is None else tedges.unionAll(part)
    sup = tedges.groupBy("x", "y").agg(F.count("*").alias("support"))
    return (
        e.join(
            sup,
            (e["subject"] == sup["x"]) & (e["object"] == sup["y"]),
            "left",
        )
        .select(
            F.col("subject").alias("x"),
            F.col("object").alias("y"),
            F.coalesce(F.col("support"), F.lit(0).cast("long")).alias(
                "support"
            ),
        )
    )


def kg_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EDGE triangle support over the co-occurrence graph — the
    edge-level sibling of kg_triangle_counts (per-node) and the
    single-pass building block of the k-truss. Support is the standard
    cohesion signal for edge denoising in KG construction: a
    correlated_with edge in zero triangles is an isolated co-mention
    (likely noise), one embedded in many is community-supported. Scale
    shape: one degree aggregate + the O(m^1.5) degree-oriented wedge
    join + a partial-agg pair count + one left join keyed on the edge
    pair — no collects, no cartesians, skew bounded by the degree
    orientation exactly as in kg_triangle_counts."""
    _, edges = get_kg(spark, sf_dir)
    e = edges.filter(
        F.col("predicate") == "biolink:correlated_with"
    ).select("subject", "object")
    return _edge_support_frame(e)


KTRUSS_K = 4
KTRUSS_FIXPOINT_UNROLL = 12


def kg_ktruss_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-TRUSS decomposition at k=KTRUSS_K: iteratively delete every
    edge in fewer than k−2 triangles until none remains to delete —
    the edge-level analog of kg_kcore_fixpoint and the denser-than-
    core cohesion standard (every k-truss is a subgraph of the
    (k−1)-core, not vice versa). Each round recomputes degree-oriented
    triangle support on the surviving edges, peels, and truncates
    lineage with localCheckpoint (the components_fixpoint OOM lesson).
    Oracle contract is EXACT, mirroring kcore: peeling is monotone, an
    oracle unrolled to KTRUSS_FIXPOINT_UNROLL rounds equals the
    fixpoint whenever convergence takes ≤ that many rounds, and the
    Spark side RAISES if it ever needs more — the two can never
    silently diverge (the adversarial case, a triangle strip that
    unravels one triangle per round, is exercised in tests)."""
    key = (*table_source_key(spark, sf_dir), "ktruss_fixpoint")
    if key not in _ITER_CACHE:
        _, edges = get_kg(spark, sf_dir)
        e = edges.filter(
            F.col("predicate") == "biolink:correlated_with"
        ).select("subject", "object")
        _ITER_CACHE[key] = ktruss_fixpoint_frame(e, KTRUSS_K)
    return _ITER_CACHE[key]


def ktruss_fixpoint_frame(e: DataFrame, k: int) -> DataFrame:
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(KTRUSS_FIXPOINT_UNROLL):
        if n_edges == 0:
            break
        kept = (
            _edge_support_frame(e)
            .filter(F.col("support") >= k - 2)
            .select(
                F.col("x").alias("subject"), F.col("y").alias("object")
            )
            .localCheckpoint(eager=True)
        )
        n_now = kept.count()
        if n_now == n_edges:
            break
        e, n_edges = kept, n_now
    else:
        raise RuntimeError(
            f"k-truss peeling did not converge within "
            f"{KTRUSS_FIXPOINT_UNROLL} rounds — raise "
            f"KTRUSS_FIXPOINT_UNROLL (and the oracle unroll with it)"
        )
    return _edge_support_frame(e)


def kg_schema_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biolink domain/range validation — the KG-construction QA gate
    the north star's "typed against the Biolink model" clause implies:
    every edge's (predicate, subject_category, object_category) triple
    is checked against the model's domain/range rules (mentions:
    Publication → entity; correlated_with: entity ↔ entity) and the
    result is a tiny rollup with a `valid` flag, so a violation burst
    from a bad source lands in monitoring instead of the merged graph.

    Scale shape: the category lookup is SPLIT by id prefix — CORD:*
    (the 10¹²-row publication side) resolves to biolink:Publication as
    pure column algebra with NO join, while the entity side joins the
    dictionary-bounded term-node table broadcast. The expensive join a
    naive validator would do (edges × full node table, shuffling the
    publication rows) never happens; unknown endpoints degrade to
    biolink:NamedThing exactly like the reference's category guesser
    (transform_utils.py:185-202)."""
    nodes, edges = get_kg(spark, sf_dir)
    term_cat = nodes.filter(
        F.col("category") != "biolink:Publication"
    ).select("id", "category").distinct()
    return schema_validation_frame(edges, term_cat)


def schema_validation_frame(
    edges: DataFrame, term_cat: DataFrame
) -> DataFrame:
    """(edges, dictionary-bounded (id, category)) → per-(predicate,
    subject_category, object_category, valid) counts."""
    tc = F.broadcast(term_cat)
    e = edges.select("subject", "predicate", "object").join(
        tc.select(
            F.col("id").alias("subject"), F.col("category").alias("s_cat")
        ),
        "subject",
        "left",
    ).join(
        tc.select(
            F.col("id").alias("object"), F.col("category").alias("o_cat")
        ),
        "object",
        "left",
    )

    def cat(side: str, joined: str) -> F.Column:
        return F.when(
            F.col(side).startswith("CORD:"), F.lit("biolink:Publication")
        ).otherwise(F.coalesce(F.col(joined), F.lit("biolink:NamedThing")))

    s = cat("subject", "s_cat")
    o = cat("object", "o_cat")
    pub = F.lit("biolink:Publication")
    valid = (
        (F.col("predicate") == "biolink:mentions")
        & (s == pub)
        & (o != pub)
    ) | (
        (F.col("predicate") == "biolink:correlated_with")
        & (s != pub)
        & (o != pub)
    )
    return (
        e.select(
            "predicate",
            s.alias("subject_category"),
            o.alias("object_category"),
            valid.alias("valid"),
        )
        .groupBy("predicate", "subject_category", "object_category", "valid")
        .agg(F.count("*").alias("n"))
    )


# Docs with doc_id % 10 == MERGE_DELTA_MOD form "today's crawl" — the
# deterministic delta slice the incremental-merge rollup ingests against
# the graph built from everything else.
MERGE_DELTA_MOD = 9


def kg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-graph incremental merge rollup — the KG-side twin of
    doc_incremental_neardup (the continuous-crawl ingest shape): the
    graph built from the INDEX docs (doc_id % 10 != MERGE_DELTA_MOD) is
    the standing artifact, the remaining docs are today's crawl, and
    the rollup reports how much of the delta's extraction output is
    genuinely NEW vs already KNOWN — per kind (term_node / cooc_edge /
    mention_edge), the ingest-monitoring number a merge pipeline gates
    on before committing a new graph version (reference merge shape:
    merge_kg.py:22-34, where every source union is followed by
    id-keyed dedup — this query measures what that dedup would drop).

    Scale shape: both join sides are DICTIONARY-bounded after their
    distincts (pairs ≤ |dict|², terms ≤ |dict|), so the new/known left
    joins never see corpus-sized inputs regardless of crawl size;
    mention edges are new by construction (fresh doc subjects) and are
    counted without any join. The per-doc pair expansion is row-local
    (pair_expand) off the persisted mention arrays — zero extra corpus
    scans beyond the shared materialization every kg_* query reuses."""
    arrays = get_mention_arrays(spark, sf_dir)
    is_delta = (F.col("doc_id") % 10) == MERGE_DELTA_MOD
    return incremental_merge_frame(
        arrays.filter(~is_delta), arrays.filter(is_delta)
    )


def incremental_merge_frame(idx: DataFrame, delta: DataFrame) -> DataFrame:
    """(index (doc_id, curies), delta (doc_id, curies)) → per-(kind,
    status) counts with kind ∈ {term_node, cooc_edge, mention_edge},
    status ∈ {new, known}."""

    def dpairs(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.explode_outer(pair_expand(F.col("curies"))).alias("p")
            )
            .filter(F.col("p").isNotNull())
            .select(
                F.col("p.s").alias("subject"), F.col("p.o").alias("object")
            )
            .distinct()
        )

    def dterms(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode_outer("curies").alias("curie"))
            .filter(F.col("curie").isNotNull())
            .distinct()
        )

    status = (
        F.when(F.col("known").isNotNull(), F.lit("known"))
        .otherwise(F.lit("new"))
        .alias("status")
    )
    pair_roll = (
        dpairs(delta)
        .join(
            dpairs(idx).withColumn("known", F.lit(1)),
            ["subject", "object"],
            "left",
        )
        .groupBy(status)
        .agg(F.count("*").alias("n"))
        .select(F.lit("cooc_edge").alias("kind"), "status", "n")
    )
    term_roll = (
        dterms(delta)
        .join(dterms(idx).withColumn("known", F.lit(1)), "curie", "left")
        .groupBy(status)
        .agg(F.count("*").alias("n"))
        .select(F.lit("term_node").alias("kind"), "status", "n")
    )
    mention_roll = (
        delta.select(F.explode_outer("curies").alias("curie"))
        .filter(F.col("curie").isNotNull())
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("mention_edge").alias("kind"),
            F.lit("new").alias("status"),
            "n",
        )
    )
    return pair_roll.unionByName(term_roll).unionByName(mention_roll)


def _edge_support_sql_round(src: str, tri: str, sup: str) -> str:
    """One triangle-support round over id-ordered edge CTE ``src`` —
    shared by the single-pass and unrolled-truss oracles. MATERIALIZED
    for the same reason as the kcore oracle: each round references the
    previous one several times and DuckDB's default CTE inlining would
    exponentiate the chain."""
    return (
        f"{tri} AS MATERIALIZED (\n"
        f"  SELECT ab.subject AS a, ab.object AS b, bc.object AS c\n"
        f"  FROM {src} ab\n"
        f"  JOIN {src} bc ON ab.object = bc.subject\n"
        f"  JOIN {src} ac ON ac.subject = ab.subject AND ac.object = bc.object\n"
        f"),\n"
        f"{sup} AS MATERIALIZED (\n"
        f"  SELECT x, y, count(*) AS n FROM (\n"
        f"    SELECT a AS x, b AS y FROM {tri}\n"
        f"    UNION ALL SELECT a, c FROM {tri}\n"
        f"    UNION ALL SELECT b, c FROM {tri}) GROUP BY x, y\n"
        f")"
    )


def _ktruss_fixpoint_sql() -> str:
    parts = ["e0 AS MATERIALIZED (SELECT subject, object FROM cooc_edges)"]
    for r in range(KTRUSS_FIXPOINT_UNROLL):
        parts.append(_edge_support_sql_round(f"e{r}", f"t{r}", f"s{r}"))
        parts.append(
            f"e{r + 1} AS MATERIALIZED (\n"
            f"  SELECT e.subject, e.object FROM e{r} e\n"
            f"  JOIN s{r} s ON e.subject = s.x AND e.object = s.y\n"
            f"  WHERE s.n >= {KTRUSS_K - 2}\n"
            f")"
        )
    last = KTRUSS_FIXPOINT_UNROLL
    parts.append(_edge_support_sql_round(f"e{last}", f"t{last}", f"s{last}"))
    return (
        ",\n".join(parts)
        + f"\nSELECT e.subject AS x, e.object AS y, s.n AS support\n"
        f"FROM e{last} e JOIN s{last} s "
        f"ON e.subject = s.x AND e.object = s.y"
    )


LINK_MAX_DIST = 2


def _deletion_keys(col: str) -> F.Column:
    """SymSpell blocking keys: every string reachable from `col` by
    deleting ≤ LINK_MAX_DIST (=2) characters, the string itself
    included. Pure higher-order-function column expression — stays in
    whole-stage codegen, no Python. lev(a,b) ≤ 2 guarantees the two
    key sets intersect (a substitution deletes one char from both
    sides, an insertion/deletion deletes one char from exactly one
    side), so an equi-join on these keys is a lossless candidate
    generator for the ≤2 edit-distance verify."""
    d1 = (
        f"transform(sequence(1, length({col})), i -> "
        f"concat(substring({col}, 1, i-1), substring({col}, i+1, 1000000)))"
    )
    d2 = (
        f"flatten(transform({d1}, s -> CASE WHEN length(s) < 1 THEN "
        f"array() ELSE transform(sequence(1, length(s)), j -> "
        f"concat(substring(s, 1, j-1), substring(s, j+1, 1000000))) END))"
    )
    return F.expr(f"array_distinct(concat(array({col}), {d1}, {d2}))")


def kg_linked_mentions_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored entity linking (north-star: "entity linking scores
    candidate mentions against a broadcast ontology/CURIE dictionary"):
    every distinct corpus token is scored against every normalized
    gazetteer surface by edit distance; candidates within
    LINK_MAX_DIST link to the (distance, curie)-minimal entry — a
    deterministic argmin, no RNG, no ties left to the engine.

    Scale shape: distinct tokens are a dictionary-bounded groupBy
    (vocabulary, not corpus, sized); candidate generation is BLOCKED,
    not a nested loop — both sides explode into their ≤2-deletion
    neighborhoods (the SymSpell key set: lev(a,b) ≤ 2 ⟹ some string
    is reachable from both by ≤2 single-character deletions, because
    each edit op deletes ≤1 char from each side), the join is a
    broadcast HASH join on that block key, and only the surviving
    candidates pay the O(len²) levenshtein verify. A 10⁶-surface
    dictionary costs |dict|·O(len²) keys instead of |vocab|·|dict|
    edit-distance evaluations — linearithmic candidates, identical
    output (the blocking is lossless for d ≤ LINK_MAX_DIST, so the
    full-semantics DuckDB oracle is unchanged). The argmin is a
    partial-agg min over a struct key and is insensitive to the
    duplicate candidates multiple shared block keys produce."""
    gaz = spark.createDataFrame(
        normalized_gazetteer(),
        "term string, curie string, name string, category string",
    ).select("term", "curie")
    return linked_mentions_scored(spark, sf_dir, gaz)


def linked_mentions_scored(
    spark: SparkSession, sf_dir: str, gaz: DataFrame
) -> DataFrame:
    """The dictionary-parametrized core of kg_linked_mentions_scored —
    ``gaz`` is any (term, curie) frame; the stress test drives it with
    a 5k-surface synthetic dictionary to exercise the blocked join at
    realistic dictionary scale.

    Two guards keep the key explosion bounded:
    * tokens longer than max(term length) + LINK_MAX_DIST are filtered
      BEFORE exploding — lossless (|len(a)−len(b)| ≤ lev(a,b)), and it
      stops a single pathological unbroken blob (a 10 KB base64 run)
      from generating len²/2 deletion keys;
    * the join strategy is chosen EXPLICITLY from the dictionary size
      (see score_linked_tokens) — the optimizer cannot be trusted with
      it: explode wrecks size estimates, and at sf1 the planner tried
      to broadcast the EXPLODED VOCABULARY side (~50M deletion keys
      from 1.1M distinct tokens) and died on the driver.
    """
    docs = read_table(spark, sf_dir, "documents")
    gaz_row = gaz.agg(
        F.max(F.length("term")).alias("m"),
        F.count("*").alias("n"),
        F.concat_ws("", F.collect_set("term")).alias("chars"),
    ).collect()  # dictionary-sized aggregation: three scalars, one action
    max_tok_len = int(gaz_row[0]["m"] or 0) + LINK_MAX_DIST
    n_terms = int(gaz_row[0]["n"])
    # alphabet prefilter (r7, guide §3.2 — drop definitely-non-matching
    # rows before the exploding join): lev(a, b) ≤ LINK_MAX_DIST means
    # ≤ LINK_MAX_DIST edit ops, and each op can account for at most ONE
    # character of `a` absent from `b` — so a token with more than
    # LINK_MAX_DIST characters outside the union dictionary alphabet is
    # beyond the distance bound to EVERY term. Lossless: pruned tokens
    # can produce no candidate, and unmatched tokens never reach the
    # output. On the sf1 vocabulary this removes 96.9% of distinct
    # tokens before the distinct + ~34-key-per-token explosion
    # (measured; the synthetic long-tail tokens are hex-ish).
    alphabet = "".join(sorted(set(gaz_row[0]["chars"] or "")))
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(
            (F.col("token") != "")
            & (F.length("token") <= max_tok_len)
            & (
                F.length(F.translate(F.col("token"), alphabet, ""))
                <= LINK_MAX_DIST
            )
        )
        .distinct()
    )
    return score_linked_tokens(toks, gaz, n_terms=n_terms)


LINK_BROADCAST_MAX_TERMS = 65_536  # dict sizes whose exploded keys fit


def score_linked_tokens(
    toks: DataFrame, gaz: DataFrame, n_terms: int | None = None
) -> DataFrame:
    """Token-frame-parametrized blocked-linking core: ``toks`` is any
    distinct (token) frame, ``gaz`` any (term, curie) frame. Production
    feeds the corpus vocabulary; the bench's dictionary slice feeds a
    capped vocabulary so the blocked equi-join can be timed against a
    nested-loop twin on identical inputs.

    The join strategy is decided HERE from one dictionary-sized count,
    never by the size estimator: Catalyst treats explode output as
    input-sized, so at sf1 it estimated 50M vocabulary deletion keys as
    ~10 MB and broadcast the corpus side of the join into a driver OOM.
    A dictionary ≤ LINK_BROADCAST_MAX_TERMS surfaces (the gazetteer
    contract — the north-star "broadcast ontology/CURIE dictionary")
    pins broadcast of the DICTIONARY keys; anything bigger pins a
    shuffle-hash join on the block key (hash-partition both exploded
    sides, no broadcast build, no sort of exploded strings).

    ``n_terms`` lets callers that already aggregated the dictionary
    (linked_mentions_scored folds the count into its max-term-length
    action) supply the size without a second scan; plan construction
    stays action-free for them. Only when no size is supplied does the
    strategy probe run its own dictionary-sized count."""
    tok_keys = toks.select(
        "token", F.explode(_deletion_keys("token")).alias("k")
    )
    gaz_keys = gaz.select(
        "term", "curie", F.explode(_deletion_keys("term")).alias("k")
    )
    if n_terms is None:
        n_terms = gaz.count()
    if n_terms <= LINK_BROADCAST_MAX_TERMS:
        gaz_keys = F.broadcast(gaz_keys)
    else:
        gaz_keys = gaz_keys.hint("shuffle_hash")
    d = F.levenshtein(F.col("token"), F.col("term"))
    scored = (
        tok_keys.join(gaz_keys, "k")
        .filter(d <= LINK_MAX_DIST)
        .select("token", "curie", d.alias("distance"))
    )
    best = scored.groupBy("token").agg(
        F.min(F.struct("distance", "curie")).alias("b")
    )
    return best.select(
        "token", F.col("b.curie").alias("curie"),
        F.col("b.distance").alias("distance"),
    )


PR_ITERS = 3
PR_BASE_PPM = 150_000
PR_DAMP_PPM = 850_000
_PPM = 1_000_000


def kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached wrapper — see _pagerank_build."""
    key = (*table_source_key(spark, sf_dir), "pagerank")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _pagerank_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _rank_update_expr(s_col: str = "s") -> str:
    """The damped rank update ``base + (damp * s) div ppm`` with the
    multiply WIDENED to DECIMAL(38,0): in int64 ``PR_DAMP_PPM * s``
    overflows once the summed in-mass ``s`` exceeds ~1.08e13 ppm — a
    single hub with ~10⁷ full-rank in-neighbors (the star-graph ceiling
    SCALE.md used to document). Decimal(38,0) holds ~1e38, so the
    ceiling moves past any real web graph; every other quantity (ranks,
    contributions, message sums) is bounded by total mass ≈ |V|·1e6 and
    stays in int64 to ~9e12 vertices. All values are non-negative, so
    ``floor(a / 1e6)`` here ≡ DuckDB's ``//`` on HUGEINT in the oracle —
    the update stays integer-exact and engine-identical (the division
    by 10^6 is exact at decimal scale 6; floor then truncates
    identically in both engines)."""
    return (
        f"CAST({PR_BASE_PPM} + CAST(floor("
        f"(CAST({PR_DAMP_PPM} AS DECIMAL(38,0)) * coalesce({s_col}, 0L))"
        f" / {_PPM}) AS BIGINT) AS LONG)"
    )


def _pagerank_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity importance over the co-occurrence graph: PR_ITERS rounds
    of damped degree-normalized message passing (PageRank power
    iteration) — the engine's iterative-algorithm surface.

    All arithmetic is integer parts-per-million with `div` (floor
    division): integer sums are order-independent, so the result is
    bit-identical at any parallelism and in DuckDB (the oracle unrolls
    the same three iterations as CTEs) — float ranks would hash-diverge
    on summation order. Each round is one broadcast-or-copartitioned
    join (ranks ⋈ degrees), one message groupBy (partial-agg friendly),
    and one left join back to the node set — the canonical distributed
    PageRank shape; production runs would checkpoint ranks per round to
    cut lineage. The damp multiply is widened to DECIMAL(38,0)
    (_rank_update_expr) so the former ~10^7-vertex star-graph int64
    ceiling cannot occur; remaining int64 quantities are bounded by
    total mass ≈ |V|·1e6 (safe to ~9e12 vertices)."""
    und = _und_cooc(spark, sf_dir)
    # localCheckpoint the loop-invariant degree table and each round's
    # ranks (r7; was persist+count+unpersist): checkpointing both
    # materializes each round AND truncates its plan to a leaf, so
    # round k's Catalyst analysis no longer re-nests every earlier
    # round (the measured growing-round-wall effect) — the same
    # discipline as the fixpoint loops. Tiny leaf frames; freed by the
    # context cleaner when the build returns.
    deg = und.groupBy(F.col("subject").alias("id")).agg(
        F.count("*").alias("deg")
    ).localCheckpoint(eager=True)
    r = deg.select("id", F.lit(_PPM).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = r.join(deg, "id").select(
            "id", F.expr("r div deg").alias("c")
        )
        msgs = (
            und.join(contrib, F.col("subject") == F.col("id"))
            .groupBy(F.col("object").alias("mid"))
            .agg(F.sum("c").alias("s"))
        )
        r = (
            deg.select("id")
            .join(msgs, F.col("id") == F.col("mid"), "left")
            .select("id", F.expr(_rank_update_expr("s")).alias("r"))
            .localCheckpoint(eager=True)
        )
    return r.select("id", F.col("r").alias("rank_ppm"))


PPR_SEED_PREFIXES = ("CHEBI:", "DrugCentral:")  # chemical/drug nodes


def kg_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank: restart mass confined to a seed set (the
    chemical/drug nodes) — the drug-centric importance ranking a
    repurposing consumer of this KG actually asks for, and the standard
    PPR formulation (teleport to seeds, not uniformly). Same
    integer-ppm / DECIMAL(38,0) machinery and per-round persist
    discipline as kg_pagerank, so the result is bit-identical at any
    parallelism and in the unrolled-CTE oracle; only the base vector
    differs: seeds restart with PR_BASE_PPM, everything else restarts
    with 0, and the initial mass sits on the seeds."""
    key = (*table_source_key(spark, sf_dir), "pagerank_personalized")
    if key not in _ITER_CACHE:
        _ITER_CACHE[key] = _ppr_build(spark, sf_dir)
    return _ITER_CACHE[key]


def _ppr_update_expr(s_col: str = "s") -> str:
    damp = (
        f"CAST(floor((CAST({PR_DAMP_PPM} AS DECIMAL(38,0)) * "
        f"coalesce({s_col}, 0L)) / {_PPM}) AS BIGINT)"
    )
    return (
        f"CAST((CASE WHEN is_seed THEN {PR_BASE_PPM} ELSE 0L END) + "
        f"{damp} AS LONG)"
    )


def _ppr_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_cooc(spark, sf_dir)
    seed_pred = None
    for p in PPR_SEED_PREFIXES:
        term = F.col("id").startswith(p)
        seed_pred = term if seed_pred is None else (seed_pred | term)
    # localCheckpoint discipline: see _pagerank_build (r7)
    deg = (
        und.groupBy(F.col("subject").alias("id"))
        .agg(F.count("*").alias("deg"))
        .withColumn("is_seed", seed_pred)
        .localCheckpoint(eager=True)
    )
    r = deg.select(
        "id", "is_seed",
        F.when(F.col("is_seed"), F.lit(_PPM))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for _ in range(PR_ITERS):
        contrib = r.join(deg.select("id", "deg"), "id").select(
            "id", F.expr("r div deg").alias("c")
        )
        msgs = (
            und.join(contrib, F.col("subject") == F.col("id"))
            .groupBy(F.col("object").alias("mid"))
            .agg(F.sum("c").alias("s"))
        )
        r = (
            deg.select("id", "is_seed")
            .join(msgs, F.col("id") == F.col("mid"), "left")
            .select("id", "is_seed", F.expr(_ppr_update_expr("s")).alias("r"))
            .localCheckpoint(eager=True)
        )
    return r.select("id", F.col("r").alias("ppr_ppm"))


def _ppr_sql() -> str:
    like = " OR ".join(f"id LIKE '{p}%'" for p in PPR_SEED_PREFIXES)
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        "deg AS (SELECT subject AS id, count(*) AS deg FROM und "
        "GROUP BY subject)",
        f"sd AS (SELECT id, deg, ({like}) AS is_seed FROM deg)",
        f"p0 AS (SELECT id, is_seed, CAST(CASE WHEN is_seed THEN {_PPM} "
        f"ELSE 0 END AS BIGINT) AS r FROM sd)",
    ]
    for k in range(PR_ITERS):
        parts.append(
            f"pc{k} AS (SELECT p{k}.id, p{k}.r // d.deg AS c "
            f"FROM p{k} JOIN sd d ON p{k}.id = d.id)"
        )
        parts.append(
            f"pm{k} AS (SELECT und.object AS id, sum(pc{k}.c) AS s "
            f"FROM und JOIN pc{k} ON und.subject = pc{k}.id "
            f"GROUP BY und.object)"
        )
        parts.append(
            f"p{k + 1} AS (SELECT d.id, d.is_seed, "
            f"CAST((CASE WHEN d.is_seed THEN {PR_BASE_PPM} ELSE 0 END) + "
            f"({PR_DAMP_PPM} * coalesce(pm{k}.s, 0)) // {_PPM} "
            f"AS BIGINT) AS r "
            f"FROM sd d LEFT JOIN pm{k} ON d.id = pm{k}.id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, r AS ppr_ppm FROM p{PR_ITERS}"


def _pagerank_sql() -> str:
    parts = [
        """und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)""",
        "deg AS (SELECT subject AS id, count(*) AS deg FROM und GROUP BY subject)",
        "r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM deg)",
    ]
    for k in range(PR_ITERS):
        parts.append(
            f"c{k} AS (SELECT r{k}.id, r{k}.r // d.deg AS c "
            f"FROM r{k} JOIN deg d ON r{k}.id = d.id)"
        )
        parts.append(
            f"m{k} AS (SELECT und.object AS id, sum(c{k}.c) AS s "
            f"FROM und JOIN c{k} ON und.subject = c{k}.id GROUP BY und.object)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT d.id, CAST({PR_BASE_PPM} + "
            f"({PR_DAMP_PPM} * coalesce(m{k}.s, 0)) // {_PPM} AS BIGINT) AS r "
            f"FROM deg d LEFT JOIN m{k} ON d.id = m{k}.id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, r AS rank_ppm FROM r{PR_ITERS}"


KG_QUERIES = {
    "kg_category_counts": kg_category_counts,
    "kg_protein_nodes": kg_protein_nodes,
    "kg_one_hop": kg_one_hop,
    "kg_two_hop": kg_two_hop,
    "kg_common_neighbors": kg_common_neighbors,
    "kg_common_neighbors_capped": kg_common_neighbors_capped,
    "web_extract_parity": _web_extract_parity,
    "kg_jaccard_link_scores": kg_jaccard_link_scores,
    "kg_jaccard_minhash_est": kg_jaccard_minhash_est,
    "kg_degree_histogram": kg_degree_histogram,
    "kg_druggable_two_hop": kg_druggable_two_hop,
    "kg_provided_by_counts": kg_provided_by_counts,
    "kg_drug_mentions": kg_drug_mentions,
    "kg_mention_counts": kg_mention_counts,
    "kg_cooccurrence_counts": kg_cooccurrence_counts,
    "kg_cooc_incremental": kg_cooc_incremental,
    "kg_cooc_lift": kg_cooc_lift,
    "kg_assoc_topk": kg_assoc_topk,
    "kg_lift_incremental": kg_lift_incremental,
    "kg_random_walks": kg_random_walks,
    "kg_walk_skipgrams": kg_walk_skipgrams,
    "kg_pagerank": kg_pagerank,
    "kg_pagerank_personalized": kg_pagerank_personalized,
    "kg_linked_mentions_scored": kg_linked_mentions_scored,
    "kg_triangle_counts": kg_triangle_counts,
    "kg_edge_support": kg_edge_support,
    "kg_ktruss_fixpoint": kg_ktruss_fixpoint,
    "kg_schema_validation": kg_schema_validation,
    "kg_incremental_merge": kg_incremental_merge,
    "kg_clustering_coefficient": kg_clustering_coefficient,
    "kg_hub_distances": kg_hub_distances,
    "kg_weighted_distances": kg_weighted_distances,
    "kg_resource_allocation": kg_resource_allocation,
    "kg_adamic_adar": kg_adamic_adar,
    "kg_label_propagation": kg_label_propagation,
    "kg_label_propagation_fixpoint": kg_label_propagation_fixpoint,
    "kg_components": kg_components,
    "kg_components_fixpoint": kg_components_fixpoint,
    "kg_kcore_fixpoint": kg_kcore_fixpoint,
    "kg_kcore": kg_kcore,
    "kg_degree_moments": kg_degree_moments,
}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _linkdict_sql() -> str:
    rows = ",\n    ".join(
        f"({_q(t)}, {_q(c)})" for t, c, _n, _cat in normalized_gazetteer()
    )
    return f"linkdict(term, curie) AS (VALUES\n    {rows})"

_CTE = kg_cte_sql()


def _walks_sql(as_cte: bool = False) -> str:
    """Unrolled walk CTEs — one chain per step, each selecting the
    adjacency row whose canonical index equals the shared hash gate
    (functions/hashing.hash_mod_sql), the exact SQL twin of the Spark
    loop in kg_random_walks. With ``as_cte`` the walk union is wrapped
    as a ``walks`` CTE for consumers (kg_walk_skipgrams)."""
    from ..functions.hashing import hash_mod_sql

    walk_ids = ", ".join(str(i) for i in range(WALKS_PER_NODE))
    parts = [
        """pair AS (
  SELECT a.curie AS subject, b.curie AS object
  FROM mentions a JOIN mentions b
    ON a.doc_id = b.doc_id AND a.curie < b.curie
  GROUP BY a.curie, b.curie
)""",
        "und AS (SELECT subject AS u, object AS v FROM pair "
        "UNION ALL SELECT object AS u, subject AS v FROM pair)",
        "adj AS (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v)"
        " - 1 AS idx, count(*) OVER (PARTITION BY u) AS deg FROM und)",
        f"w0 AS (SELECT u AS start, walk_id FROM (SELECT DISTINCT u FROM adj)"
        f" CROSS JOIN (SELECT unnest([{walk_ids}]) AS walk_id))",
    ]
    prev, prev_cur = "w0", "w.start"
    for s in range(1, WALK_STEPS + 1):
        key = f"w.start || '|' || w.walk_id || '|{s}|' || {prev_cur}"
        parts.append(
            f"c{s} AS (SELECT w.start, w.walk_id, a.v AS cur "
            f"FROM {prev} w JOIN adj a ON a.u = {prev_cur} "
            f"AND a.idx = {hash_mod_sql('walk', key, 'a.deg')})"
        )
        prev, prev_cur = f"c{s}", "w.cur"
    selects = [
        "SELECT start, walk_id, 0 AS step, start AS node FROM w0"
    ] + [
        f"SELECT start, walk_id, {s} AS step, cur AS node FROM c{s}"
        for s in range(1, WALK_STEPS + 1)
    ]
    union = "\nUNION ALL\n".join(selects)
    if as_cte:
        return ",\n".join(parts) + f",\nwalks AS (\n{union}\n)"
    return ",\n".join(parts) + "\n" + union

KG_ORACLES = {
    "kg_category_counts": f"""
WITH {_CTE}
SELECT category, count(*) AS n FROM nodes GROUP BY category
""",
    "kg_protein_nodes": f"""
WITH {_CTE}
SELECT id, name, category FROM nodes WHERE category = 'biolink:Protein'
""",
    "kg_one_hop": f"""
WITH {_CTE},
nbrs AS (
  SELECT DISTINCT id FROM (
    SELECT object AS id FROM cooc_edges WHERE subject = '{HUB}'
    UNION ALL
    SELECT subject AS id FROM cooc_edges WHERE object = '{HUB}'
  )
)
SELECT n.id, t.name, t.category
FROM nbrs n LEFT JOIN term_nodes t ON n.id = t.id
""",
    "kg_two_hop": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)
SELECT DISTINCT h1.object AS mid, h2.object AS far
FROM und h1 JOIN und h2 ON h1.object = h2.subject
WHERE h1.subject = '{HUB}' AND h2.object <> '{HUB}'
""",
    "kg_degree_histogram": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (
  SELECT subject AS id, count(DISTINCT object) AS degree
  FROM und GROUP BY subject
)
SELECT degree, count(*) AS n_entities FROM deg GROUP BY degree
""",
    "kg_common_neighbors": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)
SELECT a.subject AS x, b.subject AS y, count(DISTINCT a.object) AS n_common
FROM und a JOIN und b ON a.object = b.object
WHERE a.subject < b.subject
GROUP BY a.subject, b.subject
HAVING count(DISTINCT a.object) >= 2
""",
    # the kernel inverts the deterministic html wrapping exactly on the
    # printable-ASCII corpus, so the oracle is the raw text — any
    # extraction drift breaks the hash
    "web_extract_parity": """
SELECT doc_id, text FROM documents
""",
    "kg_common_neighbors_capped": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
low AS (
  SELECT subject AS via FROM und
  GROUP BY subject HAVING count(DISTINCT object) <= {VIA_DEGREE_CAP}
)
SELECT a.subject AS x, b.subject AS y, count(DISTINCT a.object) AS n_common
FROM und a
JOIN low l ON a.object = l.via
JOIN und b ON a.object = b.object
WHERE a.subject < b.subject
GROUP BY a.subject, b.subject
HAVING count(DISTINCT a.object) >= 2
""",
    "kg_jaccard_link_scores": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (
  SELECT subject AS id, count(DISTINCT object) AS deg FROM und GROUP BY subject
),
common AS (
  SELECT a.subject AS x, b.subject AS y, count(DISTINCT a.object) AS n_common
  FROM und a JOIN und b ON a.object = b.object
  WHERE a.subject < b.subject
  GROUP BY a.subject, b.subject
  HAVING count(DISTINCT a.object) >= 2
)
SELECT c.x, c.y, c.n_common,
  CAST(c.n_common * 1000000 // (dx.deg + dy.deg - c.n_common) AS BIGINT)
    AS jaccard_ppm
FROM common c
JOIN deg dx ON c.x = dx.id
JOIN deg dy ON c.y = dy.id
""",
    "kg_jaccard_minhash_est": f"""
WITH {_CTE},
{_jaccard_minhash_sql()}
""",
    "kg_druggable_two_hop": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
)
SELECT DISTINCT h1.object AS mid, h2.object AS far, t.name AS drug_name
FROM und h1
JOIN und h2 ON h1.object = h2.subject
JOIN term_nodes t ON h2.object = t.id AND t.category = 'biolink:Drug'
WHERE h1.subject = '{HUB}' AND h2.object <> '{HUB}'
""",
    "kg_provided_by_counts": f"""
WITH {_CTE}
SELECT provided_by, count(*) AS n FROM edges GROUP BY provided_by
ORDER BY n DESC, provided_by
""",
    "kg_drug_mentions": f"""
WITH {_CTE}
SELECT e.subject AS doc, e.object AS drug, t.name AS drug_name
FROM mention_edges e
JOIN term_nodes t ON e.object = t.id AND t.category = 'biolink:Drug'
""",
    "kg_mention_counts": f"""
WITH {_CTE}
SELECT curie, count(DISTINCT doc_id) AS n_docs FROM mentions GROUP BY curie
""",
    "kg_cooccurrence_counts": f"""
WITH {_CTE}
SELECT a.curie AS subject, b.curie AS object, count(*) AS n_docs
FROM mentions a JOIN mentions b
  ON a.doc_id = b.doc_id AND a.curie < b.curie
GROUP BY a.curie, b.curie
""",
    # incremental == full: count over disjoint slices is additive, so
    # the maintained view must hash-equal the full-corpus aggregation
    "kg_cooc_incremental": f"""
WITH {_CTE}
SELECT a.curie AS subject, b.curie AS object, count(*) AS n_docs
FROM mentions a JOIN mentions b
  ON a.doc_id = b.doc_id AND a.curie < b.curie
GROUP BY a.curie, b.curie
""",
    "kg_random_walks": f"""
WITH {_CTE},
{_walks_sql()}
""",
    "kg_walk_skipgrams": f"""
WITH {_CTE},
{_walks_sql(as_cte=True)}
SELECT a.node AS center, b.node AS context, count(*) AS n
FROM walks a JOIN walks b
  ON a.start = b.start AND a.walk_id = b.walk_id
  AND abs(a.step - b.step) BETWEEN 1 AND {SKIPGRAM_WINDOW}
GROUP BY 1, 2
""",
    # incremental == full: every sufficient statistic of lift (pair
    # supports, doc frequencies, N) is additive over disjoint doc
    # slices, so the maintained view must hash-equal the full-corpus
    # score — same contract family as kg_cooc_incremental
    "kg_lift_incremental": f"""
WITH {_CTE},
pair AS (
  SELECT a.curie AS subject, b.curie AS object, count(*) AS n_docs
  FROM mentions a JOIN mentions b
    ON a.doc_id = b.doc_id AND a.curie < b.curie
  GROUP BY a.curie, b.curie
),
dfreq AS (
  SELECT curie, count(DISTINCT doc_id) AS df FROM mentions GROUP BY curie
),
tot AS (SELECT count(DISTINCT doc_id) AS n_total FROM mentions)
SELECT p.subject, p.object, p.n_docs, ds.df AS df_s, dobj.df AS df_o,
       CAST(p.n_docs * t.n_total * 1000000 // (ds.df * dobj.df) AS BIGINT)
         AS lift_ppm
FROM pair p
JOIN dfreq ds ON p.subject = ds.curie
JOIN dfreq dobj ON p.object = dobj.curie
CROSS JOIN tot t
""",
    "kg_cooc_lift": f"""
WITH {_CTE},
pair AS (
  SELECT a.curie AS subject, b.curie AS object, count(*) AS n_docs
  FROM mentions a JOIN mentions b
    ON a.doc_id = b.doc_id AND a.curie < b.curie
  GROUP BY a.curie, b.curie
),
dfreq AS (
  SELECT curie, count(DISTINCT doc_id) AS df FROM mentions GROUP BY curie
),
tot AS (SELECT count(DISTINCT doc_id) AS n_total FROM mentions)
SELECT p.subject, p.object, p.n_docs, ds.df AS df_s, dobj.df AS df_o,
       CAST(p.n_docs * t.n_total * 1000000 // (ds.df * dobj.df) AS BIGINT)
         AS lift_ppm
FROM pair p
JOIN dfreq ds ON p.subject = ds.curie
JOIN dfreq dobj ON p.object = dobj.curie
CROSS JOIN tot t
""",
    "kg_assoc_topk": f"""
WITH {_CTE},
pair AS (
  SELECT a.curie AS subject, b.curie AS object, count(*) AS n_docs
  FROM mentions a JOIN mentions b
    ON a.doc_id = b.doc_id AND a.curie < b.curie
  GROUP BY a.curie, b.curie
),
dfreq AS (
  SELECT curie, count(DISTINCT doc_id) AS df FROM mentions GROUP BY curie
),
tot AS (SELECT count(DISTINCT doc_id) AS n_total FROM mentions),
lift AS (
  SELECT p.subject, p.object, p.n_docs,
         CAST(p.n_docs * t.n_total * 1000000 // (ds.df * dobj.df) AS BIGINT)
           AS lift_ppm
  FROM pair p
  JOIN dfreq ds ON p.subject = ds.curie
  JOIN dfreq dobj ON p.object = dobj.curie
  CROSS JOIN tot t
),
both_dirs AS (
  SELECT subject AS entity, object AS partner, n_docs, lift_ppm FROM lift
  UNION ALL
  SELECT object AS entity, subject AS partner, n_docs, lift_ppm FROM lift
)
SELECT entity, partner, n_docs, lift_ppm, CAST(rk AS INT) AS rk FROM (
  SELECT entity, partner, n_docs, lift_ppm,
         row_number() OVER (PARTITION BY entity
                            ORDER BY lift_ppm DESC, n_docs DESC,
                                     partner ASC) AS rk
  FROM both_dirs
) WHERE rk <= 3
""",
    "kg_pagerank": f"""
WITH {_CTE},
{_pagerank_sql()}
""",
    "kg_pagerank_personalized": f"""
WITH {_CTE},
{_ppr_sql()}
""",
    "kg_linked_mentions_scored": f"""
WITH {_linkdict_sql()},
toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
),
scored AS (
  SELECT t.token, g.curie, levenshtein(t.token, g.term) AS distance
  FROM toks t, linkdict g
  WHERE t.token <> ''
    AND abs(length(t.token) - length(g.term)) <= {LINK_MAX_DIST}
    AND levenshtein(t.token, g.term) <= {LINK_MAX_DIST}
),
ranked AS (
  SELECT token, curie, distance,
         row_number() OVER (PARTITION BY token
                            ORDER BY distance, curie) AS rn
  FROM scored
)
SELECT token, curie, distance FROM ranked WHERE rn = 1
""",
    "kg_triangle_counts": f"""
WITH {_CTE},
tri AS (
  SELECT ab.subject AS a, ab.object AS b, bc.object AS c
  FROM cooc_edges ab
  JOIN cooc_edges bc ON ab.object = bc.subject
  JOIN cooc_edges ac ON ac.subject = ab.subject AND ac.object = bc.object
),
members AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT id, count(*) AS n_triangles FROM members GROUP BY id
""",
    "kg_edge_support": f"""
WITH {_CTE},
{_edge_support_sql_round('cooc_edges', 'tri', 'sup')}
SELECT e.subject AS x, e.object AS y, coalesce(s.n, 0) AS support
FROM cooc_edges e
LEFT JOIN sup s ON e.subject = s.x AND e.object = s.y
""",
    "kg_ktruss_fixpoint": f"""
WITH {_CTE},
{_ktruss_fixpoint_sql()}
""",
    "kg_schema_validation": f"""
WITH {_CTE},
typed AS (
  SELECT e.predicate,
    CASE WHEN e.subject LIKE 'CORD:%' THEN 'biolink:Publication'
         ELSE coalesce(ts.category, 'biolink:NamedThing') END
      AS subject_category,
    CASE WHEN e.object LIKE 'CORD:%' THEN 'biolink:Publication'
         ELSE coalesce(tt.category, 'biolink:NamedThing') END
      AS object_category
  FROM edges e
  LEFT JOIN term_nodes ts ON e.subject = ts.id
  LEFT JOIN term_nodes tt ON e.object = tt.id
)
SELECT predicate, subject_category, object_category,
  ((predicate = 'biolink:mentions'
    AND subject_category = 'biolink:Publication'
    AND object_category <> 'biolink:Publication')
   OR (predicate = 'biolink:correlated_with'
    AND subject_category <> 'biolink:Publication'
    AND object_category <> 'biolink:Publication')) AS valid,
  count(*) AS n
FROM typed GROUP BY 1, 2, 3, 4
""",
    "kg_incremental_merge": f"""
WITH {_CTE},
delta_m AS (
  SELECT doc_id, curie FROM mentions WHERE doc_id % 10 = {MERGE_DELTA_MOD}
),
idx_m AS (
  SELECT doc_id, curie FROM mentions WHERE doc_id % 10 <> {MERGE_DELTA_MOD}
),
delta_p AS (
  SELECT DISTINCT a.curie AS s, b.curie AS o
  FROM delta_m a JOIN delta_m b ON a.doc_id = b.doc_id AND a.curie < b.curie
),
idx_p AS (
  SELECT DISTINCT a.curie AS s, b.curie AS o
  FROM idx_m a JOIN idx_m b ON a.doc_id = b.doc_id AND a.curie < b.curie
),
delta_t AS (SELECT DISTINCT curie FROM delta_m),
idx_t AS (SELECT DISTINCT curie FROM idx_m)
SELECT 'cooc_edge' AS kind,
       CASE WHEN i.s IS NULL THEN 'new' ELSE 'known' END AS status,
       count(*) AS n
FROM delta_p d LEFT JOIN idx_p i ON d.s = i.s AND d.o = i.o
GROUP BY 1, 2
UNION ALL
SELECT 'term_node',
       CASE WHEN i.curie IS NULL THEN 'new' ELSE 'known' END,
       count(*)
FROM delta_t d LEFT JOIN idx_t i ON d.curie = i.curie
GROUP BY 1, 2
UNION ALL
SELECT 'mention_edge', 'new', count(*) FROM delta_m
""",
    "kg_clustering_coefficient": f"""
WITH {_CTE},
tri AS (
  SELECT ab.subject AS a, ab.object AS b, bc.object AS c
  FROM cooc_edges ab
  JOIN cooc_edges bc ON ab.object = bc.subject
  JOIN cooc_edges ac ON ac.subject = ab.subject AND ac.object = bc.object
),
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (SELECT subject AS id, count(*) AS deg FROM und GROUP BY subject),
t AS (SELECT 3 * (SELECT count(*) FROM tri) AS t3),
w AS (SELECT sum(deg * (deg - 1) // 2) AS w FROM deg)
SELECT CAST(t3 AS BIGINT) AS triangle_participations,
       CAST(w AS BIGINT) AS n_wedges,
       CAST(CASE WHEN w > 0 THEN t3 * 1000000 // w ELSE 0 END AS BIGINT)
         AS gcc_ppm
FROM t, w
""",
    "kg_hub_distances": f"""
WITH {_CTE},
{_bfs_sql()}
""",
    "kg_weighted_distances": f"""
WITH {_CTE},
{_weighted_bfs_sql()}
""",
    "kg_resource_allocation": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (
  SELECT object AS via, count(DISTINCT subject) AS via_deg
  FROM und GROUP BY object
)
SELECT a.subject AS x, b.subject AS y,
       CAST(sum(1000000 // d.via_deg) AS BIGINT) AS ra_ppm,
       count(DISTINCT a.object) AS n_common
FROM und a
JOIN und b ON a.object = b.object
JOIN deg d ON a.object = d.via
WHERE a.subject < b.subject
GROUP BY a.subject, b.subject
HAVING count(DISTINCT a.object) >= 2
""",
    "kg_adamic_adar": f"""
WITH {_CTE},
{_aa_sql()}
""",
    "kg_label_propagation": f"""
WITH {_CTE},
{_lp_sql()}
""",
    "kg_label_propagation_fixpoint": f"""
WITH {_CTE},
{_lp_fixpoint_sql()}
""",
    "kg_components": f"""
WITH {_CTE},
{_components_sql()}
""",
    "kg_components_fixpoint": f"""
WITH RECURSIVE {_CTE},
{_components_fixpoint_sql()}
""",
    "kg_kcore": f"""
WITH {_CTE},
{_kcore_sql()}
""",
    "kg_kcore_fixpoint": f"""
WITH {_CTE},
{_kcore_fixpoint_sql()}
""",
    "kg_degree_moments": f"""
WITH {_CTE},
und AS (
  SELECT subject, object FROM cooc_edges
  UNION ALL
  SELECT object AS subject, subject AS object FROM cooc_edges
),
deg AS (
  SELECT subject AS id, count(DISTINCT object) AS deg
  FROM und GROUP BY subject
)
SELECT count(*) AS m,
       CAST(sum(a.deg) AS BIGINT) AS sum_du,
       CAST(sum(b.deg) AS BIGINT) AS sum_dv,
       CAST(sum(a.deg * b.deg) AS BIGINT) AS sum_dudv,
       CAST(sum(a.deg * a.deg) AS BIGINT) AS sum_du2,
       CAST(sum(b.deg * b.deg) AS BIGINT) AS sum_dv2
FROM und
JOIN deg a ON und.subject = a.id
JOIN deg b ON und.object = b.id
""",
}
