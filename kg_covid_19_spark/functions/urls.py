"""URL canonicalization — the web-pipeline normalizer every crawl dedup
keys on (the input table's `url` column is the engine's document key;
byte-identical extraction is contracted *per url*, so url identity must
itself be canonical).

Rules (the common crawl-dedup subset, all pure column algebra — JVM-side
in Spark, identical string ops in the DuckDB oracle):

1. drop the fragment (`#...`);
2. lowercase scheme and authority (never the path/query);
3. strip the default port (`:443` for https, `:80` for http);
4. sort query parameters (`?b=2&a=1` ≡ `?a=1&b=2`);
5. collapse the trailing-slash run: a non-root path loses ALL trailing
   slashes, an all-slash path normalizes to the root `/` (stripping one
   slash per pass is not idempotent — hypothesis found `http://x///`
   canonicalizing to a different string each application, which breaks
   canonical URLs as dedup keys).

The driver corpus' urls are already canonical, so the oracle query
manufactures deterministic messy variants from doc_id and checks the
normalizer maps them back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.corpus import read_table

_AUTH_RE = r"(?i)^(https?://[^/?#]+)"


def canonicalize_url(url: Column) -> Column:
    no_frag = F.regexp_replace(url, "#.*$", "")
    auth0 = F.regexp_extract(no_frag, _AUTH_RE, 1)
    rest = F.substring(no_frag, F.length(auth0) + 1, 2**18)
    auth = F.lower(auth0)
    auth = F.regexp_replace(auth, "^(https://.*):443$", "$1")
    auth = F.regexp_replace(auth, "^(http://.*):80$", "$1")
    path = F.regexp_replace(rest, r"\?.*$", "")
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_qs = F.array_join(F.array_sort(F.split(qs, "&")), "&")
    stripped = F.regexp_replace(path, "/+$", "")
    path = F.when(
        (F.length(stripped) == 0) & (F.length(path) > 0), F.lit("/")
    ).otherwise(stripped)
    return F.concat(
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), sorted_qs)).otherwise(F.lit("")),
    )


def _messy_url() -> Column:
    """Deterministic messy variant per doc_id (3 styles)."""
    d = F.col("doc_id")
    base = F.concat(
        F.lit("HTTPS://ExAmple.org:443/Doc/"), d.cast("string")
    )
    return (
        F.when(d % 3 == 0, F.concat(base, F.lit("?b=2&a=1#frag")))
        .when(d % 3 == 1, F.concat(base, F.lit("/")))
        .otherwise(F.concat(base, F.lit("#x")))
    )


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    messy = _messy_url()
    return docs.select(
        "doc_id",
        messy.alias("url"),
        canonicalize_url(messy).alias("canonical_url"),
    )


def _hosted_url() -> Column:
    """Deterministic multi-host URL per doc: half the corpus lands on
    host0 (the content-farm hot host every real crawl has), the rest
    spreads over 12 more hosts across 3 registrable domains."""
    h = F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % 13
    )
    return F.concat(
        F.lit("https://host"), h.cast("string"),
        F.lit(".example"), (h % 3).cast("string"),
        F.lit(".org/doc/"), F.col("doc_id").cast("string"),
    )


def web_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-HOST crawl rollup — the host-level table every web pipeline
    keeps for crawl prioritization and spam-host filtering: page count,
    language spread, and corpus bytes per authority, keyed on the host
    regexp-extracted from the url column. The synthetic url set plants
    a hot host owning half the corpus (doc_id parity), the real shape
    of a content-farm-dominated crawl.

    Scale note: host-keyed groupBy is safe under that skew WITHOUT
    salting because aggregation partial-combines map-side — the hot
    key arrives at its reducer as one pre-merged row per upstream
    partition, O(partitions), not O(pages). Host-keyed JOINS are the
    shape that needs the salt/AQE treatment (media_grid_neardup's
    lesson); keeping stats a pure aggregation is the design choice."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    )
    url = _hosted_url()
    host = F.regexp_extract(url, r"^https?://([^/]+)/", 1)
    return (
        docs.select(host.alias("host"), "lang", "n_chars")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("sum(n_chars) div count(*)").alias("mean_chars"),
        )
    )


URL_ORACLES = {
    "web_host_stats": """
WITH pages AS (
  SELECT 'https://host' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                     ELSE doc_id % 13 END AS VARCHAR) ||
         '.example' || CAST((CASE WHEN doc_id % 2 = 0 THEN 0
                                  ELSE doc_id % 13 END) % 3 AS VARCHAR) ||
         '.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         lang, length(text) AS n_chars
  FROM documents
)
SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
       count(*) AS n_pages,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
FROM pages GROUP BY 1
""",
    "url_canonicalize": r"""
WITH raw AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN 'HTTPS://ExAmple.org:443/Doc/' || CAST(doc_id AS VARCHAR) || '?b=2&a=1#frag'
         WHEN doc_id % 3 = 1
         THEN 'HTTPS://ExAmple.org:443/Doc/' || CAST(doc_id AS VARCHAR) || '/'
         ELSE 'HTTPS://ExAmple.org:443/Doc/' || CAST(doc_id AS VARCHAR) || '#x'
    END AS url
  FROM documents
),
steps AS (
  SELECT doc_id, url,
    regexp_replace(url, '#.*$', '') AS no_frag,
    regexp_extract(regexp_replace(url, '#.*$', ''), '(?i)^(https?://[^/?#]+)', 1) AS auth0
  FROM raw
),
parts AS (
  SELECT doc_id, url,
    regexp_replace(
      regexp_replace(lower(auth0), '^(https://.*):443$', '\1'),
      '^(http://.*):80$', '\1') AS auth,
    substring(no_frag, length(auth0) + 1) AS rest
  FROM steps
),
pq AS (
  SELECT doc_id, url, auth,
    regexp_replace(rest, '\?.*$', '') AS path0,
    regexp_extract(rest, '\?(.*)$', 1) AS qs
  FROM parts
)
SELECT doc_id, url,
  auth ||
  (CASE WHEN length(regexp_replace(path0, '/+$', '')) = 0
             AND length(path0) > 0
        THEN '/' ELSE regexp_replace(path0, '/+$', '') END) ||
  (CASE WHEN qs <> ''
        THEN '?' || array_to_string(list_sort(string_split(qs, '&')), '&')
        ELSE '' END) AS canonical_url
FROM pq
""",
}

URL_QUERIES = {
    "url_canonicalize": url_canonicalize,
    "web_host_stats": web_host_stats,
}
