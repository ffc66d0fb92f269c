"""The merge stage — merge.yaml union-with-provenance semantics, Spark-first.

Reference behavior (kg_covid_19/merge_utils/merge_kg.py:22-34 + merge.yaml):
KGX loads every source's node/edge TSVs into one MultiDiGraph — nodes keyed
by id with property union and provenance accumulation, edges deduped on
their key — then writes the merged artifact and graph stats
(merge.yaml:114-144). Our re-expression:

* ``unionByName(allowMissingColumns=True)`` across heterogeneous source
  frames (U1),
* node fusion: groupBy(id) with deterministic first-by-priority property
  resolution (min) and sorted provided_by accumulation (A9),
* edge dedup on (subject, predicate, object, relation) — north_rule key,
* graph stats: category × provided_by counts (A8).

Skew: node fusion groups on entity id — at web scale a handful of ids
(taxa, common diseases) carry orders of magnitude more rows than the
median. ``salted_node_fusion`` performs the canonical two-phase aggregate:
partial per (id, salt) then final per id, bounding any single reducer's
input to ~1/n_salts of the hot key. For the algebraic aggregates used here
Spark's map-side partial aggregation already achieves the same effect, so
the salted path is off by default and exists for the property-fusion
aggregates (collect_list of per-source property maps) where partial
aggregation does NOT shrink the hot key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_sources(frames: list[DataFrame]) -> DataFrame:
    """U1: heterogeneous multi-source union (merge.yaml:6-113)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def _accum_provenance() -> F.Column:
    # provided_by accumulation, deterministic order (merge semantics:
    # provenance accumulated across sources, merge_kg.py:22-34)
    return F.concat_ws("|", F.sort_array(F.collect_set("provided_by"))).alias(
        "provided_by"
    )


def merge_nodes(frames: list[DataFrame]) -> DataFrame:
    """A9 node fusion: one row per id, min-resolved properties, accumulated
    provenance. min() is the deterministic stand-in for the reference's
    insertion-order first-wins (SURVEY.md §7.4 risk 1)."""
    return (
        union_sources(frames)
        .groupBy("id")
        .agg(
            F.min("name").alias("name"),
            F.min("category").alias("category"),
            _accum_provenance(),
        )
    )


def salted_node_fusion(frames: list[DataFrame], n_salts: int = 16) -> DataFrame:
    """Two-phase (salted) node fusion for skew-heavy property aggregation.

    Phase 1 groups on (id, salt) — the hot id's rows spread over n_salts
    reducers; phase 2 merges the ≤n_salts partials per id. Results are
    identical to merge_nodes (min/union are commutative+associative).
    """
    u = union_sources(frames).withColumn(
        "_salt", F.pmod(F.xxhash64("name", "category", "provided_by"), F.lit(n_salts))
    )
    partial = u.groupBy("id", "_salt").agg(
        F.min("name").alias("name"),
        F.min("category").alias("category"),
        F.collect_set("provided_by").alias("pbs"),
    )
    return partial.groupBy("id").agg(
        F.min("name").alias("name"),
        F.min("category").alias("category"),
        F.concat_ws(
            "|", F.array_sort(F.array_distinct(F.flatten(F.collect_list("pbs"))))
        ).alias("provided_by"),
    )


def merge_edges(frames: list[DataFrame]) -> DataFrame:
    """Edge dedup on the north_rule key (subject, predicate, object,
    relation) with provenance accumulation."""
    return (
        union_sources(frames)
        .groupBy("subject", "predicate", "object", "relation")
        .agg(_accum_provenance())
    )


def remap_node_identifier(
    nodes: DataFrame,
    edges: DataFrame,
    category: str = "biolink:Protein",
    alternative_property: str = "xrefs",
    prefix: str = "UniProtKB",
) -> tuple[DataFrame, DataFrame]:
    """merge.yaml:42-47's `kgx.utils.graph_utils.remap_node_identifier`
    operation: nodes of `category` whose `alternative_property` ('|'-
    multivalued) carries a `prefix:`-id get that id as their new node id,
    and every edge endpoint referencing an old id is rewritten.

    Spark shape: the old→new map is derived from the node frame itself
    and joined onto subject and object (left + coalesce). The map is
    |rewritten nodes|-sized — usually small relative to edges, so AQE
    will broadcast it; no hint is forced because at web scale a remap
    over the full protein universe can exceed broadcast limits, and a
    shuffled hash join on the endpoint key is then correct."""
    from ..functions.curie import get_identifier_by_prefix

    alt = get_identifier_by_prefix(F.col(alternative_property), prefix + ":")
    eligible = (F.col("category") == category) & (
        F.coalesce(F.col(alternative_property), F.lit("")) != ""
    )
    new_id = F.when(eligible, F.coalesce(alt, F.col("id"))).otherwise(
        F.col("id")
    )
    remapped_nodes = nodes.withColumn("id", new_id)
    mapping = (
        nodes.select(F.col("id").alias("_old"), new_id.alias("_new"))
        .filter(F.col("_old") != F.col("_new"))
        .distinct()
    )
    e = edges
    for endpoint in ("subject", "object"):
        e = (
            e.join(
                mapping.withColumnRenamed("_old", endpoint),
                endpoint,
                "left",
            )
            .withColumn(endpoint, F.coalesce("_new", endpoint))
            .drop("_new")
        )
    return remapped_nodes, e.select(*edges.columns)


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A8: the KGX generate_graph_stats analog (merge.yaml:114-122) —
    node counts per (category, provided_by) plus edge counts per
    (predicate, provided_by), unioned with a kind discriminator."""
    n = nodes.groupBy(
        F.lit("node").alias("kind"),
        F.col("category").alias("facet"),
        "provided_by",
    ).agg(F.count("*").alias("n"))
    e = edges.groupBy(
        F.lit("edge").alias("kind"),
        F.col("predicate").alias("facet"),
        "provided_by",
    ).agg(F.count("*").alias("n"))
    return n.unionByName(e)
