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


def test_ntriples_roundtrip(spark, tmp_path):
    """write_ntriples → read_ntriples → contract is the identity on the
    graph: every node id/category/name and edge triple survives the
    K2 nt.gz export byte-exactly."""
    from pyspark.sql import functions as F

    from kg_covid_19_spark.sources.rdf import (
        NT_EXPAND,
        RDF_TYPE_IRI,
        RDFS_LABEL_IRI,
        contract_iri,
        read_ntriples,
        write_ntriples,
    )

    nodes = spark.createDataFrame(
        [
            ("MONDO:0005091", 'SARS "severe"', "biolink:Disease"),
            ("CHEBI:15377", None, "biolink:Drug"),
            ("CORD:abc12", "Document \\ one", "biolink:Publication"),
            ("WEIRD:x9", "odd prefix", "biolink:NamedThing"),
        ],
        "id string, name string, category string",
    )
    edges = spark.createDataFrame(
        [
            ("MONDO:0005091", "biolink:correlated_with", "CHEBI:15377"),
            ("CORD:abc12", "biolink:mentions", "MONDO:0005091"),
        ],
        "subject string, predicate string, object string",
    )
    out = str(tmp_path / "merged-kg-nt")
    write_ntriples(nodes, edges, out)

    back = read_ntriples(spark, out)
    # contraction map: reader-side view of the writer's expansions
    cmap = {**NT_EXPAND, "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
            "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}
    tri = back.select(
        contract_iri(F.col("subject_iri"), cmap).alias("s"),
        contract_iri(F.col("predicate_iri"), cmap).alias("p"),
        contract_iri(F.coalesce("object_iri", "object_literal"), cmap).alias("o"),
        F.col("object_literal").isNotNull().alias("lit"),
    ).collect()
    got = {(r["s"], r["p"], r["o"]) for r in tri}
    assert ("MONDO:0005091", "biolink:correlated_with", "CHEBI:15377") in got
    assert ("CORD:abc12", "biolink:mentions", "MONDO:0005091") in got
    types = {(r["s"], r["o"]) for r in tri if r["p"] == RDF_TYPE_IRI}
    assert ("MONDO:0005091", "biolink:Disease") in types
    # unmapped prefix survives losslessly in the urn:x-curie form
    # (recoverable by stripping the fixed prefix)
    assert ("urn:x-curie:WEIRD:x9", "biolink:NamedThing") in types
    labels = {(r["s"], r["o"]) for r in tri if r["p"] == RDFS_LABEL_IRI}
    assert ("MONDO:0005091", 'SARS "severe"') in labels  # escaping round-trips
    assert ("CORD:abc12", "Document \\ one") in labels
    # unnamed node emits no label line
    assert not any(s == "CHEBI:15377" for s, _ in labels)
    # gz on disk
    import glob
    assert glob.glob(f"{out}/part-*.gz")
