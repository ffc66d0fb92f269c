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
5. strip a trailing slash from a non-root path.

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
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
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


URL_ORACLES = {
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
  (CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
        THEN substring(path0, 1, length(path0) - 1) ELSE path0 END) ||
  (CASE WHEN qs <> ''
        THEN '?' || array_to_string(list_sort(string_split(qs, '&')), '&')
        ELSE '' END) AS canonical_url
FROM pq
""",
}

URL_QUERIES = {
    "url_canonicalize": url_canonicalize,
}
