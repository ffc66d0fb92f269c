"""Property-based (hypothesis) differential tests: the JVM column
expressions in functions/curie.py and the SciBite/RDF contraction chains
must agree with straightforward Python models of the reference semantics
on arbitrary inputs — the same differential-oracle idea as the driver's
DuckDB gate, pushed down to the scalar-function layer (C1-C14)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kg_covid_19_spark.functions.curie import (
    collapse_uniprot_curie,
    fix_underscore_curie,
    pipe_join,
    pipe_split,
    scrub_whitespace,
    strip_xml_suffix,
)
from kg_covid_19_spark.sources.rdf import GOCAM_CMAP, contract_iri

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# printable-ish strings without surrogates; Spark/Arrow handle these fine
text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=40,
)
curie_ish = st.one_of(
    text_st,
    st.from_regex(r"(?i)uniprotkb:[A-Z0-9]{1,8}(-[0-9]{1,3})?", fullmatch=True),
    st.from_regex(r"[A-Za-z]{2,10}:[A-Za-z0-9._-]{1,12}", fullmatch=True),
)


def _eval(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.out for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


@SET
@given(st.lists(curie_ish, min_size=1, max_size=60))
def test_collapse_uniprot_matches_reference_model(spark, values):
    # model: utils/transform_utils.py:205-218
    def model(s):
        if s.lower().startswith("uniprotkb:"):
            return re.sub(r"-\d+$", "", s)
        return s

    assert _eval(spark, values, collapse_uniprot_curie) == [
        model(v) for v in values
    ]


@SET
@given(st.lists(curie_ish, min_size=1, max_size=60))
def test_collapse_uniprot_is_idempotent(spark, values):
    once = _eval(spark, values, collapse_uniprot_curie)
    twice = _eval(
        spark, once, collapse_uniprot_curie
    )
    assert once == twice


@SET
@given(st.lists(text_st, min_size=1, max_size=60))
def test_scrub_whitespace_model(spark, values):
    assert _eval(spark, values, scrub_whitespace) == [
        re.sub(r"[\n\t]", " ", v) for v in values
    ]


@SET
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd")
                ),
                min_size=1,
                max_size=8,
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_pipe_join_split_roundtrip(spark, lists):
    # C6 roundtrip on pipe-free tokens (the reference's invariant domain)
    joined = ["|".join(toks) for toks in lists]
    df = spark.createDataFrame([(v,) for v in joined], "v string")
    got = [
        r.out
        for r in df.select(pipe_split(F.col("v")).alias("out")).collect()
    ]
    assert got == lists
    df2 = spark.createDataFrame([(v,) for v in lists], "v array<string>")
    rejoined = [
        r.out for r in df2.select(pipe_join(F.col("v")).alias("out")).collect()
    ]
    assert rejoined == joined


@SET
@given(st.lists(text_st, min_size=1, max_size=60))
def test_strip_xml_suffix_model(spark, values):
    assert _eval(spark, values, strip_xml_suffix) == [
        re.sub(r"\.xml$", "", v) for v in values
    ]


@SET
@given(st.lists(text_st, min_size=1, max_size=60))
def test_fix_underscore_model(spark, values):
    assert _eval(spark, values, fix_underscore_curie) == [
        v.replace("_", ":") for v in values
    ]


_iri_st = st.one_of(
    st.sampled_from(list(GOCAM_CMAP.values())).flatmap(
        lambda base: st.from_regex(r"[A-Za-z0-9._-]{1,12}", fullmatch=True).map(
            lambda suf: base + suf
        )
    ),
    st.from_regex(r"http://unknown\.example/[A-Za-z0-9]{1,10}", fullmatch=True),
)


@SET
@given(st.lists(_iri_st, min_size=1, max_size=60))
def test_contract_iri_longest_prefix_model(spark, iris):
    def model(iri):
        best = None
        for prefix, base in GOCAM_CMAP.items():
            if iri.startswith(base) and (
                best is None or len(base) > len(best[1])
            ):
                best = (prefix, base)
        if best is None:
            return iri
        return f"{best[0]}:{iri[len(best[1]):]}"

    assert _eval(spark, iris, contract_iri) == [model(i) for i in iris]
