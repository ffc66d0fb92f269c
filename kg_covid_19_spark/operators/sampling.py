"""Corpus sampling / mixing operators (training-data pipeline suite).

No reference analog — kg-covid-19 samples only for ML holdouts
(make_holdouts.py, see operators/holdouts.py); these are the
corpus-construction counterparts every large-scale training-data
pipeline needs: stratified down-sampling (keep x% of each language /
source stratum) and epoch-style up-sampling (repeat low-resource
strata with fractional weights).

Both are hash-gated, not RNG-gated: a document's fate is a pure
function of its id, so results are identical across runs, engines,
parallelism levels and resumed checkpoints — `rand()`-based sampling is
none of those. Both are narrow single-pass scans: zero shuffles, the
predicate/explode runs map-side, and the hash expression is inlined
identically into the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash_mod, hash_mod_sql
from ..sources.corpus import read_table

PPM = 1_000_000

# stratified keep-rates (parts per million) per language stratum —
# down-weight the over-represented head, keep the tail
SAMPLE_RATES_PPM = {
    "en": 750_000,
    "de": 500_000,
    "fr": 500_000,
    "es": 500_000,
    "zh": 250_000,
}

# epoch-mix weights: average copies per document, fractional part
# resolved by hash gate (e.g. 2.5 → every doc twice, half of them a
# third time)
EPOCH_WEIGHTS = {
    "en": 1.0,
    "de": 2.5,
    "fr": 2.5,
    "es": 2.5,
    "zh": 4.0,
}


def _hash_ppm(tag: str, doc_id: Column) -> Column:
    """Uniform [0, 1e6) gate — the shared engine-parity hash
    (functions/hashing.py; never rand(): partition-order dependent)."""
    return hash_mod(tag, doc_id, PPM)


def _rate_expr(rates: dict[str, int], lang: Column) -> Column:
    expr: Column = F.lit(0)
    for lg, rate in sorted(rates.items()):
        expr = F.when(lang == lg, F.lit(rate)).otherwise(expr)
    return expr


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: keep a document iff its hash
    gate falls under its language's keep-rate. Unknown strata default
    to rate 0 (dropped) — the conservative corpus-mixing behavior."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rate = _rate_expr(SAMPLE_RATES_PPM, F.col("lang"))
    return docs.filter(_hash_ppm("strat", F.col("doc_id")) < rate)


def doc_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-style up-sampling: each document appears floor(w) times
    plus one more iff its hash gate falls under frac(w) — so a stratum
    with weight w contributes w× its documents in expectation, exactly
    and deterministically. Output (doc_id, lang, copy) with copy in
    [0, n_copies). Row-local explode — no shuffle."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w_ppm = _rate_expr(
        {lg: int(round(w * PPM)) for lg, w in EPOCH_WEIGHTS.items()},
        F.col("lang"),
    )
    base = (w_ppm / PPM).cast("long")  # floor for non-negative weights
    extra = F.when(
        _hash_ppm("epoch", F.col("doc_id")) < (w_ppm % PPM), F.lit(1)
    ).otherwise(F.lit(0))
    n_copies = (base + extra).alias("n_copies")
    return (
        docs.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy"),
        )
    )


def _rate_sql(rates: dict[str, int]) -> str:
    whens = " ".join(
        f"WHEN lang = '{lg}' THEN {rate}" for lg, rate in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE 0 END)"


def _hash_ppm_sql(tag: str) -> str:
    return hash_mod_sql(tag, "doc_id", str(PPM))




SEQ_LEN = 2048
PACK_SHARD = 1000  # docs per packing shard (see scale note)


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign each document its (shard, seq_id,
    seq_offset) in fixed-SEQ_LEN context windows built by streaming
    concatenation within a packing shard: the pretraining step that
    turns a deduped corpus into training rows. Deterministic: the
    stream order is (lang, shard, doc_id) and the assignment is pure
    integer window arithmetic (cumulative token count before the doc,
    floor-divided by the window length).

    Scale note (why the shard column exists): packing is inherently
    sequential WITHIN a stream, so one window per language would funnel
    a whole stratum through one reducer at 100 TB. Sharding the stream
    (doc_id div PACK_SHARD) caps every window partition at PACK_SHARD
    rows at the cost of at most one under-filled trailing window per
    shard — the standard wasted-pad/parallelism trade, stated rather
    than hidden. Token counts are whitespace-split counts (identical
    split semantics in both engines, consecutive-space empties
    included)."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    pre = docs.select(
        "doc_id",
        "lang",
        # integer `div`, matching the oracle's `//` exactly — a float
        # `/` + cast truncates toward zero and loses exactness past
        # 2^53 (the repo's integer-arithmetic parity discipline)
        F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return pre.withColumn("cb", cum_before).select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.expr(f"CAST(cb div {SEQ_LEN} AS LONG)").alias("seq_id"),
        F.expr(f"CAST(cb % {SEQ_LEN} AS LONG)").alias("seq_offset"),
    )


CHUNK_LEN = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (retrieval/embedding prep):
    fixed CHUNK_LEN-char windows every CHUNK_STRIDE chars, overlap
    CHUNK_LEN−CHUNK_STRIDE, last window ragged. Pure row-local column
    arithmetic — sequence + substring explode, no shuffle, no Python —
    and exactly one chunk for empty/short docs (start 1). Chunk ids
    are (doc_id, chunk_idx), deterministic."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - (CHUNK_LEN - CHUNK_STRIDE), F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        docs.select(
            "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "s")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(f"substring(text, s, {CHUNK_LEN})").alias("chunk"),
        )
    )


def doc_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: keep each document with
    probability equal to its quality score — the corpus-shaping step
    between scoring and training. The gate is the deterministic hash
    stream vs floor(quality·10⁶): floor() (not a bare cast) because
    Spark casts double→long by truncation while DuckDB rounds —
    floor() is the same IEEE operation in both. quality itself is the
    already-parity-checked 6-decimal txt_quality score, so the whole
    predicate is bit-identical cross-engine."""
    from ..functions.textstats import txt_quality

    q = txt_quality(spark, sf_dir).select("doc_id", "quality")
    gate = _hash_ppm("qsamp", F.col("doc_id"))
    return (
        q.filter(gate < F.floor(F.col("quality") * PPM).cast("long"))
        .select("doc_id", "quality")
    )


SAMPLING_ORACLES = {
    "doc_quality_sample": f"""
WITH q AS (
  SELECT doc_id,
    round(least(len(string_split(text, ' ')) / 50.0, 1.0) *
          (1.0 - abs(len(list_filter(string_split(text, ' '),
                                     t -> t IN ('the', 'a'))) /
                     CAST(len(string_split(text, ' ')) AS DOUBLE)
                     - 0.1)), 6) AS quality
  FROM documents
)
SELECT doc_id, quality FROM q
WHERE {_hash_ppm_sql('qsamp')} < CAST(floor(quality * {PPM}) AS BIGINT)
""",
    "doc_chunk_sliding": f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       substr(text, 1 + i * {CHUNK_STRIDE}, {CHUNK_LEN}) AS chunk
FROM documents,
     LATERAL (SELECT unnest(range(0,
        1 + CAST(floor(
          (greatest(length(text) - {CHUNK_LEN - CHUNK_STRIDE}, 1) - 1)
          / {CHUNK_STRIDE}.0) AS BIGINT))) AS i)
""",
    "doc_pack_sequences": f"""
WITH t AS (
  SELECT doc_id, lang, doc_id // {PACK_SHARD} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, shard, n_tokens,
  CAST(((sum(n_tokens) OVER w) - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id,
  CAST(((sum(n_tokens) OVER w) - n_tokens) % {SEQ_LEN} AS BIGINT) AS seq_offset
FROM t
WINDOW w AS (PARTITION BY lang, shard ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING)
""",
    "doc_stratified_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {_hash_ppm_sql('strat')} < {_rate_sql(SAMPLE_RATES_PPM)}
""",
    "doc_epoch_mix": f"""
WITH w AS (
  SELECT doc_id, lang,
    ({_rate_sql({lg: int(round(wt * PPM)) for lg, wt in EPOCH_WEIGHTS.items()})} // {PPM})
    + (CASE WHEN {_hash_ppm_sql('epoch')} <
        ({_rate_sql({lg: int(round(wt * PPM)) for lg, wt in EPOCH_WEIGHTS.items()})} % {PPM})
       THEN 1 ELSE 0 END) AS n_copies
  FROM documents
)
SELECT doc_id, lang, unnest(range(0, n_copies)) AS copy
FROM w WHERE n_copies > 0
""",
}

SAMPLING_QUERIES = {
    "doc_chunk_sliding": doc_chunk_sliding,
    "doc_quality_sample": doc_quality_sample,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_epoch_mix": doc_epoch_mix,
    "doc_pack_sequences": doc_pack_sequences,
}
