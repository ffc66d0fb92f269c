"""Training-corpus export — the composite gate a 100 TB pipeline runs
before materializing training data: exact dedup ∧ language gate ∧
quality gate ∧ benchmark decontamination, in one declarative plan.

Each component is an already-oracle-verified operator (dedup exact
keep-first, txt_quality scoring, doc_decontaminate); this plan composes
them so Catalyst sees ONE tree: the text is scanned once, the dedup
keep-set and contamination set are derived frames joined back
(left_semi / left_anti), and the final projection carries the audit
columns. At scale the contamination build side broadcasts; the dedup
keep-set join shuffles on doc_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import DECON_MOD, doc_decontaminate
from ..sources.corpus import read_table

EXPORT_LANG = "en"
QUALITY_MIN = 0.5
STOPWORDS = ["the", "a"]  # functions/textstats.py STOPWORDS


def _quality(toks) -> F.Column:
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    len_gate = F.least(n / F.lit(50.0), F.lit(1.0))
    return len_gate * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.1)))


def corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept training documents with audit columns."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    # exact dedup: first (min doc_id) per text hash survives
    keep = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    contaminated = doc_decontaminate(spark, sf_dir).select("doc_id")

    return (
        docs.join(keep, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .filter(F.col("lang") == EXPORT_LANG)
        .filter(F.col("doc_id") % DECON_MOD != 0)  # benchmark never trains
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.round(_quality(toks), 6).alias("quality"),
        )
        .filter(F.col("quality") >= QUALITY_MIN)
    )


def _export_sql() -> str:
    from ..operators.dedup import DEDUP_ORACLES

    decon = DEDUP_ORACLES["doc_decontaminate"].strip().rstrip()
    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
contaminated AS (
  {decon}
)
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  round(
    least(len(string_split(text, ' ')) / 50.0, 1.0) *
    (1.0 - abs(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the', 'a')))
               / len(string_split(text, ' ')) - 0.1)),
    6) AS quality
FROM documents
WHERE doc_id IN (SELECT doc_id FROM keep)
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND lang = '{EXPORT_LANG}'
  AND doc_id % {DECON_MOD} <> 0
  AND round(
    least(len(string_split(text, ' ')) / 50.0, 1.0) *
    (1.0 - abs(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the', 'a')))
               / len(string_split(text, ' ')) - 0.1)),
    6) >= {QUALITY_MIN}
"""


EXPORT_QUERIES = {
    "corpus_export": corpus_export,
}

EXPORT_ORACLES = {
    "corpus_export": _export_sql(),
}
