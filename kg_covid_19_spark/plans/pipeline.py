"""End-to-end KG construction plan (SURVEY.md §7.2 minimum slice, grown up).

web_pages → text kernel → mention detection (broadcast gazetteer, Arrow UDF)
→ triple extraction (mentions + co-occurrence edges) → node/edge frames.

Shuffle budget at 100 TB (the thing that decides whether this survives a
1000-executor cluster):

* mention detection, mention edges, pair generation: **zero shuffles** —
  narrow map chain; per-doc dedup happens inside the kernel (row-local
  state) and co-occurrence pairs are expanded from the per-row mention
  array, never via a groupBy/self-join on doc_id.
* term nodes: groupBy over ≤|dictionary| distinct keys — partial
  aggregation collapses each task's output to ≤|dictionary| rows before
  the exchange, so the shuffle is KB-sized regardless of corpus size.
* co-occurrence dedup: `dropDuplicates` over the pair key — the distinct
  universe is |dictionary|², not corpus-sized, so map-side partial
  aggregation absorbs the hot keys (every doc mentions NCBITaxon:9606-style
  terms) before any network transfer. AQE skew handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dictionaries import (
    COOC_PREDICATE,
    COOC_RELATION,
    DOC_PREFIX,
    MENTION_PREDICATE,
    MENTION_RELATION,
    PROVIDED_BY,
    PUB_CATEGORY,
    normalized_gazetteer,
)
from ..functions.text import extracted_text
from ..operators.mentions import make_mention_udf
from ..sources.corpus import web_pages


def pages_with_mentions(spark: SparkSession, sf_dir: str,
                        langs: tuple[str, ...] | None = None) -> DataFrame:
    """web_pages + ``curies: array<string>`` — the sorted, per-document-
    deduped canonical mention set. One narrow pass: text kernel + broadcast-
    dictionary automaton, no shuffle."""
    pages = web_pages(spark, sf_dir, langs)
    udf = make_mention_udf()
    return (
        pages.withColumn("text", extracted_text(F.col("text"), F.col("html")))
        .withColumn(
            "curies",
            F.sort_array(F.transform(udf(F.col("text")), lambda m: m["curie"])),
        )
    )


def doc_mentions(spark: SparkSession, sf_dir: str,
                 langs: tuple[str, ...] | None = None) -> DataFrame:
    """(doc_id, curie) distinct mention pairs — the engine's E4 analog.

    Distinct by construction (the kernel dedups per document against the
    pre-normalized gazetteer, dictionaries.normalized_gazetteer) — the
    reference's ``seen`` set (scibite_cord.py:187-188) without any shuffle.
    """
    return (
        pages_with_mentions(spark, sf_dir, langs)
        .select("doc_id", F.explode("curies").alias("curie"))
    )


def gazetteer_nodes(spark: SparkSession) -> DataFrame:
    """Canonical (curie, name, category) — one row per canonical CURIE,
    min-resolved over gazetteer entries that collapse onto it (the
    connected-component-free prefix/lexicographic dedup of the north rule)."""
    gaz = spark.createDataFrame(
        normalized_gazetteer(),
        "term string, curie string, name string, category string",
    )
    return gaz.groupBy("curie").agg(
        F.min("name").alias("name"), F.min("category").alias("category")
    )


def build_kg(spark: SparkSession, sf_dir: str,
             langs: tuple[str, ...] | None = None) -> tuple[DataFrame, DataFrame]:
    """Full pipeline → (nodes, edges) KGX frames.

    Mirrors the reference transform+merge contract: publication node per
    document (scibite_cord.py:141-188), term node per mentioned entity,
    biolink:mentions doc→term edges (scibite_cord.py:220-232), pair-deduped
    biolink:correlated_with term-term edges (scibite_cord.py:290-340), all
    deduped on the KGX keys (id) / (subject,predicate,object,relation).
    """
    pm = pages_with_mentions(spark, sf_dir, langs)
    doc_curie = F.concat(F.lit(DOC_PREFIX), F.col("doc_id").cast("string"))

    pub_nodes = pm.select(
        doc_curie.alias("id"),
        F.concat(F.lit("Document "), F.col("doc_id").cast("string")).alias("name"),
        F.lit(PUB_CATEGORY).alias("category"),
        F.lit(PROVIDED_BY).alias("provided_by"),
    )

    mentions = pm.select("doc_id", F.explode("curies").alias("curie"))

    # term nodes: distinct mentioned curies (KB-sized groupBy) ⋈ broadcast
    # canonical dictionary.
    term_nodes = (
        mentions.select("curie").distinct()
        .join(F.broadcast(gazetteer_nodes(spark)), "curie")
        .select(
            F.col("curie").alias("id"), "name", "category",
            F.lit(PROVIDED_BY).alias("provided_by"),
        )
    )
    nodes = term_nodes.unionByName(pub_nodes)

    mention_edges = mentions.select(
        doc_curie.alias("subject"),
        F.lit(MENTION_PREDICATE).alias("predicate"),
        F.col("curie").alias("object"),
        F.lit(MENTION_RELATION).alias("relation"),
        F.lit(PROVIDED_BY).alias("provided_by"),
    )

    # co-occurrence pairs expanded row-locally from the sorted mention array
    # (i < j ⇒ s < o), then deduped on the edge key.
    pairs = pm.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "curies",
                        lambda a: F.transform(
                            F.col("curies"),
                            lambda b: F.struct(a.alias("s"), b.alias("o")),
                        ),
                    )
                ),
                lambda p: p["s"] < p["o"],
            )
        ).alias("p")
    ).select(F.col("p.s").alias("subject"), F.col("p.o").alias("object"))

    cooc_edges = (
        pairs.dropDuplicates(["subject", "object"])
        .select(
            "subject",
            F.lit(COOC_PREDICATE).alias("predicate"),
            "object",
            F.lit(COOC_RELATION).alias("relation"),
            F.lit(PROVIDED_BY).alias("provided_by"),
        )
    )

    edges = mention_edges.unionByName(cooc_edges)
    return nodes, edges
