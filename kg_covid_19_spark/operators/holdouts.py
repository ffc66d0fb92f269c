"""ML holdout construction (reference: make_holdouts.py + run.py:130-198).

The reference splits the merged graph into train/test/valid positive edge
sets and samples negative (non-)edges, filtering them against the positives
with a pandas left-anti merge (make_holdouts.py:184-191).

Spark-first, and *better than randomSplit at scale*: splits are **hash-
based** — bucket = md5(edge key) mod 10 → train 0-7, valid 8, test 9.
Hash splits are deterministic across runs, parallelism levels and engines
(randomSplit is partition-order dependent), reproducible without storing
the split, and exactly what production corpus pipelines use. Negative
sampling is likewise hash-ordered: candidate pairs ranked by md5(pair),
anti-joined against ALL positive edges, first N kept.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.merged import get_merged

N_NEG = 100
CAND_NODES = 40  # candidate universe: first nodes by md5(id)


def _bucket10(*cols: Column | str) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10)
        .cast("long")
        % 10
    )


def edge_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every merged edge tagged train/valid/test by hash bucket (8/1/1)."""
    _, edges = get_merged(spark, sf_dir)
    b = _bucket10("subject", "predicate", "object")
    return edges.select(
        "subject",
        "predicate",
        "object",
        F.when(b <= 7, "train").when(b == 8, "valid").otherwise("test").alias("split"),
    )


def holdout_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split sizes — the reference's 0.8/0.1/0.1 fraction assertion
    (tests/test_holdouts.py:60-120) as an aggregate."""
    return edge_splits(spark, sf_dir).groupBy("split").agg(F.count("*").alias("n"))


def connected_edge_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-coverage-preserving split (X1's custom variant).

    The reference's primary holdout path (ensmallen
    ``random_holdout``, make_holdouts.py:59-75) keeps the training
    graph connected so every node stays learnable. The distributed,
    connected-components-free analog: each node's minimum-hash incident
    edge is FORCED into train (one groupBy on node + one semi-join on
    the edge hash — no iterative CC), the rest split 8/1/1 by edge
    hash. Guarantees every non-isolated node has ≥1 train edge;
    deterministic at any parallelism. At 100 TB both shuffles are
    single-key exchanges; the anchor set is ≤|V| rows and joins on the
    edge hash, so AQE can pick the strategy per scale."""
    _, edges = get_merged(spark, sf_dir)
    h = F.md5(F.concat_ws("|", "subject", "predicate", "object"))
    e = edges.select("subject", "predicate", "object", h.alias("h"))
    anchors = (
        e.select(F.explode(F.array("subject", "object")).alias("node"), "h")
        .groupBy("node")
        .agg(F.min("h").alias("h"))
        .select("h")
        .distinct()
        .withColumn("forced", F.lit(True))
    )
    b = _bucket10("subject", "predicate", "object")
    return (
        e.join(anchors, "h", "left")
        .select(
            "subject",
            "predicate",
            "object",
            F.when(F.col("forced"), "train")
            .when(b <= 7, "train")
            .when(b == 8, "valid")
            .otherwise("test")
            .alias("split"),
        )
    )


def holdout_connected_split_counts(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Split sizes for the coverage-preserving variant."""
    return (
        connected_edge_splits(spark, sf_dir)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
    )


def holdout_negative_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: hash-ranked candidate pairs from a
    hash-selected node subset, anti-joined against positives (J9), first
    N_NEG by pair hash."""
    nodes, edges = get_merged(spark, sf_dir)
    univ = (
        nodes.select("id")
        .orderBy(F.md5("id"), "id")
        .limit(CAND_NODES)
    )
    a = univ.select(F.col("id").alias("subject"))
    b = univ.select(F.col("id").alias("object"))
    cand = a.crossJoin(b).filter(F.col("subject") != F.col("object"))
    negatives = cand.join(
        edges.select("subject", "object").distinct(), ["subject", "object"], "left_anti"
    )
    return (
        negatives.orderBy(F.md5(F.concat_ws("|", "subject", "object")))
        .limit(N_NEG)
        .select("subject", "object")
    )


def holdout_oracles(merged_cte: str) -> dict[str, str]:
    return {
        "holdout_split_counts": f"""
WITH {merged_cte},
tagged AS (
  SELECT CASE
    WHEN ('0x' || substr(md5(subject || '|' || predicate || '|' || object), 1, 15))::UBIGINT % 10 <= 7 THEN 'train'
    WHEN ('0x' || substr(md5(subject || '|' || predicate || '|' || object), 1, 15))::UBIGINT % 10 = 8 THEN 'valid'
    ELSE 'test' END AS split
  FROM merged_edges
)
SELECT split, count(*) AS n FROM tagged GROUP BY split
""",
        "holdout_connected_split_counts": f"""
WITH {merged_cte},
e AS (
  SELECT subject, predicate, object,
         md5(subject || '|' || predicate || '|' || object) AS h
  FROM merged_edges
),
inc AS (
  SELECT subject AS node, h FROM e
  UNION ALL SELECT object AS node, h FROM e
),
forced AS (
  SELECT DISTINCT h FROM (SELECT node, min(h) AS h FROM inc GROUP BY node)
),
tagged AS (
  SELECT CASE
    WHEN e.h IN (SELECT h FROM forced) THEN 'train'
    WHEN ('0x' || substr(e.h, 1, 15))::UBIGINT % 10 <= 7 THEN 'train'
    WHEN ('0x' || substr(e.h, 1, 15))::UBIGINT % 10 = 8 THEN 'valid'
    ELSE 'test' END AS split
  FROM e
)
SELECT split, count(*) AS n FROM tagged GROUP BY split
""",
        "holdout_negative_edges": f"""
WITH {merged_cte},
univ AS (
  SELECT id FROM merged_nodes ORDER BY md5(id), id LIMIT {CAND_NODES}
),
cand AS (
  SELECT a.id AS subject, b.id AS object
  FROM univ a CROSS JOIN univ b WHERE a.id <> b.id
),
negs AS (
  SELECT c.subject, c.object FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM merged_edges e
    WHERE e.subject = c.subject AND e.object = c.object
  )
)
SELECT subject, object FROM negs
ORDER BY md5(subject || '|' || object) LIMIT {N_NEG}
""",
    }


HOLDOUT_QUERIES = {
    "holdout_split_counts": holdout_split_counts,
    "holdout_connected_split_counts": holdout_connected_split_counts,
    "holdout_negative_edges": holdout_negative_edges,
}


def _default_oracles() -> dict[str, str]:
    from ..dictionaries import merged_cte_sql

    return holdout_oracles(merged_cte_sql())


HOLDOUT_ORACLES = _default_oracles()
