"""grlc .rq plumbing parity (reference tests/test_query.py:23-66)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from kg_covid_19_spark.plans.queries import KG_QUERIES
from kg_covid_19_spark.plans.rq import (
    RQ_TO_PLAN,
    parse_query_rq,
    result_bindings_to_df,
    result_dict_to_tsv,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def test_parse_query_rq_goldens():
    q = parse_query_rq(f"{REF}/tests/resources/query/test_template.yaml")
    assert q["title"] == "some title"
    assert q["description"] == "what is it"
    assert q["endpoint"] == "http://zombo.com"
    assert q["query"] == (
        "SELECT (COUNT(?v2) AS ?v1) ?v0\nWHERE {\n"
        "  ?v2 <https://w3id.org/biolink/vocab/category> ?v0\n} GROUP BY ?v0\n"
    )


def test_all_shipped_rq_templates_parse_and_map():
    qdir = f"{REF}/queries"
    rq_files = sorted(f for f in os.listdir(qdir) if f.endswith(".rq"))
    assert rq_files == sorted(RQ_TO_PLAN)
    for f in rq_files:
        parsed = parse_query_rq(os.path.join(qdir, f))
        assert parsed["query"].strip(), f
        assert RQ_TO_PLAN[f] in KG_QUERIES


RESULT_DICT = {
    "head": {"vars": ["v1", "v0"]},
    "results": {
        "bindings": [
            {"v1": {"value": "42"}, "v0": {"value": "disease"}},
            {"v1": {"value": "10384"}, "v0": {"value": "human_phenotype"}},
            {"v1": {"value": "7"}},  # missing binding → ERROR
        ]
    },
}


def test_result_dict_to_tsv(tmp_path):
    out = str(tmp_path / "out.tsv")
    result_dict_to_tsv(RESULT_DICT, out)
    df = pd.read_csv(out, sep="\t")
    assert df.shape == (3, 2)
    assert list(df.columns) == ["v1", "v0"]
    assert list(df.iloc[1]) == [10384, "human_phenotype"]
    assert df.iloc[2]["v0"] == "ERROR"


def test_result_bindings_to_df(spark):
    df = result_bindings_to_df(spark, RESULT_DICT)
    assert df.columns == ["v1", "v0"]
    assert df.count() == 3


def test_sql_view_surface_matches_dataframe_plans(spark):
    from kg_covid_19_spark.plans.sql_views import (
        QUERY_01_SQL,
        QUERY_06_SQL,
        register_kg_views,
    )

    from conftest import SF_DIR

    names = register_kg_views(spark, SF_DIR)
    assert names == ["kg_nodes", "kg_edges", "kg_mentions"]
    got = sorted(tuple(r) for r in spark.sql(QUERY_01_SQL).collect())
    want = sorted(
        tuple(r) for r in KG_QUERIES["kg_category_counts"](spark, SF_DIR).collect()
    )
    assert got == want
    q6 = spark.sql(QUERY_06_SQL).collect()
    assert q6 and q6[0].cnt == max(r.cnt for r in q6)  # ORDER BY DESC


def test_valueless_front_matter_raises(tmp_path):
    """`=+ key` with no value raises ValueError, matching the
    reference's two-element unpack (query.py:34-36) — never silently
    parsed as SPARQL body."""
    import pytest

    from kg_covid_19_spark.plans.rq import parse_query_rq

    p = tmp_path / "bad.rq"
    p.write_text("=+ summary a query\n=+ orphankey\nSELECT * WHERE {}\n")
    with pytest.raises(ValueError, match="orphankey"):
        parse_query_rq(str(p))
    # trailing-blank value is also valueless after rstrip (reference
    # rstrips before splitting)
    p.write_text("=+ orphankey   \nSELECT 1\n")
    with pytest.raises(ValueError):
        parse_query_rq(str(p))
