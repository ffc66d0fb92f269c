"""RDF n-triples (GO-CAM) source — S9 parity
(reference tests/test_gocams.py is a smoke over the same fixture;
contraction map + node-property predicates from gocam_transform.py:62-79)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_spark.sources.rdf import (
    contract_iri,
    gocam_transform,
    read_ntriples,
)

from pyspark.sql import functions as F

REF_NT = (
    "/root/reference/tests/resources/gocams/"
    "lifted-go-cams-20200619_SNIPPET.nt"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_NT), reason="reference fixtures not available"
)


def test_read_ntriples_parses_every_line(spark):
    df = read_ntriples(spark, REF_NT)
    assert df.count() == 499  # every fixture line is one triple
    assert df.filter(F.col("predicate_iri") == "").count() == 0


def test_gocam_smoke_and_shapes(spark):
    nodes, edges = gocam_transform(spark, REF_NT)
    n, e = nodes.count(), edges.count()
    assert e == 499  # no fixture predicate is a node property
    assert n > 0
    assert nodes.select("id").distinct().count() == n  # no dup nodes
    # biolink vocab predicates contracted
    preds = {r.predicate for r in edges.select("predicate").distinct().collect()}
    assert "biolink:related_to" in preds
    assert all(p.startswith("biolink:") for p in preds)


def test_contract_iri_longest_prefix_and_fallback(spark):
    df = spark.createDataFrame(
        [
            ("http://purl.obolibrary.org/obo/go/extensions/reacto.owl#REACTO_R-HSA-1",),
            ("http://identifiers.org/wormbase/WBGene00001",),
            ("http://purl.obolibrary.org/obo/GO_0003723",),
            ("http://unknown.example.org/x",),
        ],
        "iri string",
    )
    got = [r.c for r in df.select(contract_iri(F.col("iri")).alias("c")).collect()]
    assert got == [
        "REACT:R-HSA-1",
        "WB:WBGene00001",
        "GO:0003723",
        "http://unknown.example.org/x",  # no-match passthrough
    ]


def test_node_property_predicates_fold_onto_nodes(spark, tmp_path):
    nt = tmp_path / "mini.nt"
    nt.write_text(
        "<http://model.geneontology.org/m1> "
        "<https://w3id.org/biolink/vocab/related_to> "
        "<http://purl.obolibrary.org/obo/GO_0003723> .\n"
        "<http://model.geneontology.org/m1> "
        "<http://geneontology.org/lego/evidence> "
        '"ECO:0000322" .\n'
    )
    nodes, edges = gocam_transform(spark, str(nt))
    assert edges.count() == 1  # evidence triple folded, not an edge
    m1 = nodes.filter(F.col("id") == "GOCAM:m1").collect()[0]
    assert m1.properties == {"LEGO:evidence": "ECO:0000322"}
    go = nodes.filter(F.col("id") == "GO:0003723").collect()[0]
    assert go.category == "biolink:OntologyClass"
    assert go.properties == {}


def test_malformed_lines_are_skipped_not_fatal(spark, tmp_path):
    nt = tmp_path / "bad.nt"
    nt.write_text(
        "<http://model.geneontology.org/m1> "
        "<https://w3id.org/biolink/vocab/related_to> "
        "<http://purl.obolibrary.org/obo/GO_1> .\n"
        "# a comment line\n"
        "\n"
        "this is not a triple at all\n"
        "<http://model.geneontology.org/m2> incomplete\n"
    )
    df = read_ntriples(spark, str(nt))
    assert df.count() == 1  # only the well-formed triple survives
