"""Corpus sampling / mixing operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_covid_19_spark.operators.sampling import (
    EPOCH_WEIGHTS,
    SAMPLE_RATES_PPM,
    doc_epoch_mix,
    doc_stratified_sample,
)

from conftest import SF_DIR, assert_df_matches_oracle


def test_stratified_sample_matches_oracle(spark, duck):
    from kg_covid_19_spark.operators.sampling import SAMPLING_ORACLES

    assert_df_matches_oracle(
        doc_stratified_sample(spark, SF_DIR),
        duck,
        SAMPLING_ORACLES["doc_stratified_sample"],
    )


def test_stratified_sample_rates_approximate(spark):
    """Each stratum keeps ≈ rate of its documents (hash gate is uniform);
    at fixture scale allow a wide tolerance but pin the ordering."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in
            doc_stratified_sample(spark, SF_DIR)
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, rate in SAMPLE_RATES_PPM.items():
        if totals.get(lang, 0) >= 20:
            frac = kept.get(lang, 0) / totals[lang]
            assert abs(frac - rate / 1e6) < 0.35, (lang, frac, rate)


def test_epoch_mix_copy_counts_exact(spark):
    """floor(w) copies always; the fractional extra only ever adds one;
    per-doc copy indices are dense 0..n-1."""
    mix = doc_epoch_mix(spark, SF_DIR)
    per_doc = (
        mix.groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n"), F.max("copy").alias("mx"),
             F.min("copy").alias("mn"))
        .collect()
    )
    assert per_doc, "mix must be non-empty"
    for r in per_doc:
        w = EPOCH_WEIGHTS[r["lang"]]
        base = int(w)
        assert r["n"] in (base, base + 1), (r["lang"], w, r["n"])
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1

    # expectation: average copies per doc ≈ w per stratum
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    mixed = {r["lang"]: r["n"] for r in
             mix.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, w in EPOCH_WEIGHTS.items():
        if totals.get(lang, 0) >= 20:
            avg = mixed.get(lang, 0) / totals[lang]
            assert abs(avg - w) < 0.5, (lang, avg, w)


def test_sampling_is_parallelism_invariant(spark):
    """Hash gates, not rand(): same sampled set at any partitioning."""
    a = sorted(tuple(r) for r in doc_stratified_sample(spark, SF_DIR).collect())
    b = sorted(
        tuple(r)
        for r in doc_stratified_sample(spark, SF_DIR).repartition(13).collect()
    )
    assert a == b


def test_redact_pii_goldens(spark):
    """Pattern goldens on synthesized PII strings (the corpus itself is
    digit-free, so the oracle query injects PII; this pins the raw
    function behavior)."""
    from kg_covid_19_spark.functions.textstats import redact_pii

    rows = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@sub.example.co.uk please",),
            ("server 192.168.001.1 down",),
            ("call +1 555-123 4567 now",),
            ("no pii here",),
        ],
        "s string",
    ).select(redact_pii(F.col("s")).alias("r")).collect()
    assert rows[0]["r"] == "mail me at <EMAIL> please"
    assert rows[1]["r"] == "server <IP> down"
    assert rows[2]["r"] == "call <PHONE> now"
    assert rows[3]["r"] == "no pii here"


def test_asof_join_semantics(spark, tmp_path):
    """Each click gets the latest view at-or-before it; no prior view →
    NULL (left-asof); same-instant view matches."""
    import datetime as dt

    from kg_covid_19_spark.streaming import events as ev_mod

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            (1, t(10), 7, "view", 0.0, ""),
            (2, t(20), 7, "click", 0.0, ""),   # matches view 1
            (3, t(30), 7, "view", 0.0, ""),
            (4, t(30), 7, "click", 0.0, ""),   # same instant → view 3
            (5, t(5), 9, "click", 0.0, ""),    # no prior view → NULL
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["click_id"]: (r["view_id"], r["lag_us"])
        for r in ev_mod.evt_asof_view_click(spark, str(tmp_path)).collect()
    }
    assert out[2] == (1, 10_000_000)
    assert out[4] == (3, 0)
    assert out[5] == (None, None)


def test_dup_ngrams_counts(spark, tmp_path):
    from kg_covid_19_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "a b c d x", "en", "s", 9),
            (2, "z a b c d", "en", "s", 9),   # shares 'a b c d' with 1
            (3, "a b c d a b c d", "en", "s", 15),  # contains it twice
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["ngram_hash"]: r for r in
            dd.doc_dup_ngrams(spark, str(tmp_path)).collect()}
    import hashlib
    h = hashlib.md5(b"a b c d").hexdigest()
    assert h in rows
    assert rows[h]["n_docs"] == 3
    assert rows[h]["n_occurrences"] == 4
