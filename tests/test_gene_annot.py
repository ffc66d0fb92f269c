"""GPI/GPA source parity vs the reference goldens
(tests/test_sars_cov_2_gene_annot.py:29-90)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_spark.sources.gene_annot import gene_annot_transform, gpi_nodes

REF = "/root/reference/tests/resources"
GPI = f"{REF}/uniprot_sars-cov-2_SNIPPET.gpi"
GPA = f"{REF}/uniprot_sars-cov-2_SNIPPET.gpa"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def test_gpi_node_golden(spark):
    rows = {r.id: list(r) for r in gpi_nodes(spark, GPI).collect()}
    # golden from tests/test_sars_cov_2_gene_annot.py:49-66
    assert rows["UniProtKB:P0DTD2"] == [
        "UniProtKB:P0DTD2", "P0DTD2", "biolink:Protein", "Protein 9b", "",
        "NCBITaxon:2697049", "PR:000050272|UniProtKB:P0DTD1-PRO_0000449637",
        "sars_cov_2_gene_annot",
    ]


def test_gpa_edge_golden(spark):
    _, edges = gene_annot_transform(spark, GPI, GPA)
    rows = [list(r) for r in edges.collect()]
    # golden from tests/test_sars_cov_2_gene_annot.py:70-90
    assert [
        "UniProtKB:P0DTC1", "biolink:enables", "GO:0003723", "RO:0002327",
        "sars_cov_2_gene_annot", "biolink:Association", "GO_REF:0000043",
        "ECO:0000322", "UniProtKB-KW:KW-0694", "", "20200321", "UniProt",
        "", "go_evidence=IEA",
    ] in rows


def test_bare_endpoint_nodes_guessed(spark):
    nodes, edges = gene_annot_transform(spark, GPI, GPA)
    by_id = {r.id: r for r in nodes.collect()}
    # every GPA endpoint has a node; GO endpoints are OntologyClass
    for r in edges.collect():
        assert r.subject in by_id and r.object in by_id
        if r.object.startswith("GO:"):
            assert by_id[r.object].category == "biolink:OntologyClass"
    # no duplicate ids
    assert nodes.count() == nodes.select("id").distinct().count()


def test_gpi_record_count_golden(spark):
    # reference tests/test_gpi_file.py:15-28: the curated full GPI file
    # parses to exactly 32 records
    curated = "/root/reference/curated/ORFs/uniprot_sars-cov-2.gpi"
    if not os.path.exists(curated):
        pytest.skip("curated gpi not available")
    assert gpi_nodes(spark, curated).count() == 32


def test_synonym_overlap_matches_reference_script_output(spark):
    """The DataFrame re-expression of the curated ORFs QA script
    (curated/ORFs/merge_KGCOVID_COVIDscholar_syns.py) reproduces the
    script's behavior on the current inputs exactly: 31 of 32 ORFs
    matched, 52 GPI-only synonym reports, 225 scholar-only reports —
    verified against a line-faithful Python transcription of the
    script run on the same files. (The committed .out in the reference
    tree predates edits to the input files, so its counts differ; the
    script, not its stale artifact, is the contract.)"""
    from kg_covid_19_spark.sources.gene_annot import synonym_overlap

    base = "/root/reference/curated/ORFs"
    summary, diff = synonym_overlap(
        spark,
        f"{base}/uniprot_sars-cov-2.gpi",
        f"{base}/synonyms_list_COVIDscholar.txt",
    )
    s = summary.collect()[0]
    assert (s["n_matched"], s["n_total"]) == (31, 32)
    sides = {r["side"]: 0 for r in diff.select("side").distinct().collect()}
    for r in diff.groupBy("side").count().collect():
        sides[r["side"]] = r["count"]
    assert sides == {"kg_only": 52, "cs_only": 225}
