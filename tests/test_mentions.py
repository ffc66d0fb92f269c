"""Mention-detector kernel unit tests (token Aho-Corasick + UDF plumbing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_covid_19_spark.operators.mentions import TokenAhoCorasick, with_mentions

ENTRIES = [
    ("spark", "HGNC:11219", "SPARK", "biolink:Gene"),
    ("data frame", "GO:0001", "dataframe process", "biolink:OntologyClass"),
    ("big data frame", "GO:0002", "bigger", "biolink:OntologyClass"),
]


def test_unigram_and_phrase_matching():
    ac = TokenAhoCorasick(ENTRIES)
    hits = ac.find("the Spark big data frame; a data   frame again")
    curies = {h[1] for h in hits}
    assert curies == {"HGNC:11219", "GO:0001", "GO:0002"}


def test_per_doc_dedup_first_span_kept():
    ac = TokenAhoCorasick(ENTRIES)
    hits = ac.find("spark spark spark")
    assert len(hits) == 1
    assert hits[0][4:6] == (0, 1)


def test_empty_and_none():
    ac = TokenAhoCorasick(ENTRIES)
    assert ac.find("") == []
    assert ac.find("nothing matches here") == []


def test_with_mentions_explode(spark):
    df = spark.createDataFrame(
        [(1, "spark and a data frame"), (2, "no hits"), (3, None)],
        "doc_id int, text string",
    )
    out = with_mentions(df, "text", ENTRIES, cache_key="test-entries").select(
        "doc_id", "curie"
    )
    rows = {(r.doc_id, r.curie) for r in out.collect()}
    assert rows == {(1, "HGNC:11219"), (1, "GO:0001")}


def test_determinism_across_parallelism(spark):
    """Same mentions regardless of partitioning (SURVEY.md §5 item 4)."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("spark data frame doc "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    a = with_mentions(df.repartition(1), "text", ENTRIES, "t1")
    b = with_mentions(df.repartition(16), "text", ENTRIES, "t1")
    ra = sorted((r.doc_id, r.curie) for r in a.collect())
    rb = sorted((r.doc_id, r.curie) for r in b.collect())
    assert ra == rb and len(ra) == 400
