"""IntAct miXML parity vs the reference's exact goldens
(tests/test_intact.py:49-180)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_spark.sources.intact import intact_transform, parse_intact_xml

REF = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def test_counts_and_golden_rows(spark):
    nodes, edges = intact_transform(spark, f"{REF}/intact_test.xml")
    nrows = [list(r) for r in nodes.collect()]
    erows = [list(r) for r in edges.collect()]
    assert len(nrows) == 5 and len(erows) == 8
    assert ["UniProtKB:P20290", "btf3_human", "biolink:Protein", "9606",
            "intact"] in nrows
    assert ["UniProtKB:P0C6X7-PRO_0000037317", "nsp10_cvhsa", "biolink:RNA",
            "694009", "intact"] in nrows
    assert ["UniProtKB:P20290", "biolink:interacts_with",
            "UniProtKB:P0C6X7-PRO_0000037317", "RO:0002437", "intact",
            "biolink:Association", "PMID:16157265", "2",
            "physical association", "2 hybrid", "prey", "bait"] in erows


def test_three_participant_pairwise_expansion(spark):
    nodes, edges = intact_transform(spark, f"{REF}/intact_3_participants.xml")
    erows = [list(r) for r in edges.collect()]
    assert nodes.count() == 3 and len(erows) == 3  # (1,2) (1,3) (2,3)
    assert ["UniProtKB:Q3T133", "biolink:interacts_with", "UniProtKB:P41811",
            "RO:0002437", "intact", "biolink:Association", "PMID:23481256",
            "3", "physical association", "itc", "neutral component",
            "bait"] in erows


def test_chebi_id_fix():
    with open(f"{REF}/31315999_weird_chebi_id.xml", "rb") as fh:
        nodes, edges = parse_intact_xml(fh.read())
    assert nodes[0][0] == "CHEBI:28304"
    assert edges[0][0] == "CHEBI:28304"


def test_multi_file_glob(spark):
    # both fixtures through one binaryFile glob → union of per-file results
    nodes, edges = intact_transform(
        spark, f"{REF}/intact_{{test,3_participants}}.xml"
    )
    assert nodes.count() == 8 and edges.count() == 11
