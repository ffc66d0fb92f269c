"""Similarity search over embedding columns (array<float>).

Two plans:

* ``emb_knn_bruteforce`` — exact top-k cosine for a bounded query set.
  The query side is tiny → **broadcast**; the corpus streams past it, so
  the plan is one narrow pass over the corpus + a top-k window. At 100 TB
  this is the right exact baseline: no corpus shuffle at all, cost
  |corpus| × |queries| × dim fused in codegen.
* ``emb_lsh_ann`` — sign-random-projection (hyperplane) LSH: 8 fixed
  ±1 hyperplanes (deterministically derived from md5, identical constants
  inlined into the oracle SQL) bucket every vector into a 8-bit key;
  candidates are bucket-mates; top-k within bucket. The join shuffles on
  the bucket key only — the scale path when the query set is itself huge.

All arithmetic is float32→float64 cast then sequential double ops — the
Spark higher-order functions and DuckDB's list functions produce
bit-identical doubles (verified), so cosine ranks agree exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.corpus import read_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8
DIM = 64


def _plane(p: int) -> list[float]:
    """Deterministic ±1 hyperplane components from md5(p:j)."""
    out = []
    for j in range(DIM):
        h = hashlib.md5(f"{p}:{j}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) % 2 == 1 else -1.0)
    return out


PLANES: list[list[float]] = [_plane(p) for p in range(N_PLANES)]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def emb_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query set × streamed corpus."""
    vecs = _vectors(spark, sf_dir)
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("q")
        )
    )
    scored = (
        vecs.join(queries, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))))
            .alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _bucket(v: Column) -> Column:
    """8-bit sign-projection bucket key."""
    key = F.lit(0)
    for p, plane in enumerate(PLANES):
        arr = F.array(*[F.lit(x) for x in plane])
        key = key + F.when(_dot(v, arr) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return key


def emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via hyperplane-LSH buckets: candidates share the 8-bit key;
    exact cosine re-rank within bucket, top-k per query."""
    vecs = _vectors(spark, sf_dir).withColumn("bucket", _bucket(F.col("v")))
    queries = F.broadcast(
        vecs.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("q"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        vecs.join(
            queries,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))))
            .alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _planes_sql(p: int) -> str:
    return "[" + ", ".join(f"{x:.1f}" for x in PLANES[p]) + "]"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_planes_sql(p)}) > 0 THEN {2**p} ELSE 0 END)"
    for p in range(N_PLANES)
)

SIM_ORACLES = {
    "emb_knn_bruteforce": f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.v', 'c.v')} AS sim
  FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
""",
    "emb_lsh_ann": f"""
WITH vecs AS (
  SELECT vec_id, v, {_BUCKET_SQL} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.v', 'c.v')} AS sim
  FROM vecs q JOIN vecs c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
""",
}

SIM_QUERIES = {
    "emb_knn_bruteforce": emb_knn_bruteforce,
    "emb_lsh_ann": emb_lsh_ann,
}
