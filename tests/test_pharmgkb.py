"""PharmGKB source parity vs the reference goldens
(tests/test_pharmgkb.py:33-84)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kg_covid_19_spark.sources.pharmgkb import (
    pharmgkb_transform,
    preferred_drug_id,
    read_id_map,
    uniprot_gene_id,
)

REF = "/root/reference/tests/resources"
RELS = f"{REF}/relationships_SNIPPET.tsv"
GENES = f"{REF}/pharmgkb_gene_SNIPPET.tsv"
DRUGS = f"{REF}/drugs.tsv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def test_gene_id_map_golden(spark):
    # reference test_make_id_mapping_file: keys {PA24356, PA165392995},
    # parsed_ids['UniProtKB'] == 'P04217' for PA24356
    m = read_id_map(spark, GENES)
    rows = {r.pharmgkb_id: r for r in m.collect()}
    assert sorted(rows) == ["PA165392995", "PA24356"]
    parsed = dict((e.k, e.v) for e in rows["PA24356"].parsed_ids)
    assert parsed["UniProtKB"] == "P04217"
    assert (
        uniprot_gene_id(F.col("pharmgkb_id"), F.col("parsed_ids"))
        .alias("gid")
        ._jc is not None
    )
    got = m.select(
        "pharmgkb_id",
        uniprot_gene_id(F.col("pharmgkb_id"), F.col("parsed_ids")).alias("g"),
    ).collect()
    assert dict((r.pharmgkb_id, r.g) for r in got)["PA24356"] == (
        "UniProtKB:P04217"
    )


@pytest.mark.parametrize(
    "pharmgkb_id,preferred",
    [
        ("PA164712302", "pharmgkb.drug:PA164712302"),  # no usable xrefs
        ("PA131887008", "CHEBI:1391"),  # ChEBI:CHEBI:1391 xref
    ],
)
def test_make_preferred_drug_id_golden(spark, pharmgkb_id, preferred):
    # reference test_make_preferred_drug_id parameterized goldens
    m = read_id_map(spark, DRUGS).filter(F.col("pharmgkb_id") == pharmgkb_id)
    got = m.select(
        preferred_drug_id(F.col("pharmgkb_id"), F.col("xref_pairs")).alias(
            "p"
        )
    ).collect()
    assert [r.p for r in got] == [preferred]


def test_pharmgkb_end_to_end_golden(spark):
    # relationships_SNIPPET has exactly one Gene–Chemical row:
    # ANKFN1 (PA142672624, not in gene map → PHARMGKB: fallback) ×
    # hydrochlorothiazide (PA449899, not in drug map → pharmgkb.drug:)
    nodes, edges = pharmgkb_transform(spark, RELS, GENES, DRUGS)
    assert sorted(tuple(r) for r in nodes.collect()) == [
        ("PHARMGKB:PA142672624", "ANKFN1", "biolink:Gene", "pharmgkb"),
        (
            "pharmgkb.drug:PA449899", "hydrochlorothiazide",
            "biolink:Drug", "pharmgkb",
        ),
    ]
    assert [tuple(r) for r in edges.collect()] == [
        (
            "pharmgkb.drug:PA449899", "biolink:interacts_with",
            "PHARMGKB:PA142672624", "RO:0002436", "pharmgkb",
            "biolink:Association", "ClinicalAnnotation,VariantAnnotation",
        )
    ]


def test_sssom_normalizes_drug_node_not_edge(spark):
    sssom = spark.createDataFrame(
        [("pharmgkb.drug:PA449899", "CHEBI:5778")],
        "subject_id string, object_id string",
    )
    nodes, edges = pharmgkb_transform(spark, RELS, GENES, DRUGS, sssom)
    node_ids = {r.id for r in nodes.collect()}
    assert "CHEBI:5778" in node_ids  # node id normalized
    # edge subject stays un-normalized (pharmgkb.py:283 emits preferred id)
    assert [r.subject for r in edges.collect()] == ["pharmgkb.drug:PA449899"]
