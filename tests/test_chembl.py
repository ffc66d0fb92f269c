"""ChEMBL parity vs the reference goldens (tests/test_chembl.py:25-65)."""

from __future__ import annotations

import ast
import os

import pytest

from kg_covid_19_spark.sources.chembl import (
    EDGE_COLS,
    chembl_transform,
    parse_activity,
)

REF = "/root/reference/tests/resources/chembl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

FILES = {
    "molecules_data": f"{REF}/chembl_molecule_records.json",
    "assay_data": f"{REF}/chembl_assay_records.json",
    "document_data": f"{REF}/chembl_document_records.json",
    "activity_data": f"{REF}/chembl_activity_records.json",
}

# golden key set from tests/test_chembl.py:25-42
EXPECTED_CA_KEYS = {
    "standard_units", "standard_type", "standard_relation",
    "target_pref_name", "assay", "publications", "object", "subject",
    "assay_organism", "standard_value", "uo_units", "target_organism",
    "id", "predicate", "relation", "provided_by", "type",
}


def test_activity_snippet_golden():
    with open(f"{REF}/chembl_activities.snippet.txt") as fh:
        records = [ast.literal_eval(line) for line in fh]
    parsed = [parse_activity(r["_source"]) for r in records]
    assert len(parsed) == 5  # tests/test_chembl.py:62
    assert set(parsed[0].keys()) == EXPECTED_CA_KEYS
    assert set(EDGE_COLS) == EXPECTED_CA_KEYS


def test_transform_counts_and_shape(spark):
    nodes, edges = chembl_transform(spark, FILES)
    import json

    n_acts = len(json.load(open(FILES["activity_data"])))
    assert edges.count() == n_acts
    assert edges.columns == EDGE_COLS
    # one taxon node (both TAXON_MAP names map to the same curie)
    taxa = nodes.filter(nodes.category == "biolink:OrganismTaxon").collect()
    assert len(taxa) == 1 and taxa[0].id == "NCBITaxon:2697049"
    # every edge subject is a CHEMBL.COMPOUND curie
    assert edges.filter(~edges.subject.startswith("CHEMBL.COMPOUND:")).count() == 0


def test_taxon_remap_and_uo_units():
    rec = {
        "activity_id": 1,
        "molecule_chembl_id": "CHEMBL1",
        "target_chembl_id": "CHEMBL2",
        "assay_chembl_id": "CHEMBL3",
        "document_chembl_id": "CHEMBL4",
        "target_organism": "SARS-CoV-2",
        "uo_units": "UO_0000022",
    }
    e = parse_activity(rec)
    assert e["object"] == "NCBITaxon:2697049"  # C10 taxon remap
    assert e["uo_units"] == "UO:0000022"  # C12 underscore fixup


def test_chembl_molecule_sssom_normalization(spark):
    from pyspark.sql import functions as F

    from kg_covid_19_spark.sources.chembl import chembl_transform

    nodes, _ = chembl_transform(spark, FILES)
    some_id = (
        nodes.filter(F.col("category") == "biolink:Drug")
        .select("id").first().id
    )
    sssom = spark.createDataFrame(
        [(some_id, "CHEBI:99999"), ("NOPE:1", "CHEBI:1")],
        "subject_id string, object_id string",
    )
    norm_nodes, _ = chembl_transform(spark, FILES, sssom_df=sssom)
    ids = {r.id for r in norm_nodes.collect()}
    assert "CHEBI:99999" in ids and some_id not in ids
    # identity on miss: everything else unchanged
    assert norm_nodes.count() == nodes.count()
