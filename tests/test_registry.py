"""Source registry parity: same 14 keys as the reference's
DATA_SOURCES (transform.py:23-38), and the dispatcher writes the
reference's per-source KGX TSV tree."""

from __future__ import annotations

import os
import shutil

import pytest

from kg_covid_19_spark.sources.registry import DATA_SOURCES, transform

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

REFERENCE_KEYS = [
    "ZhouTransform", "DrugCentralTransform", "TTDTransform",
    "StringTransform", "ScibiteCordTransform", "PharmGKB",
    "SARSCoV2GeneAnnot", "IntAct", "GoTransform", "HpTransform",
    "MondoTransform", "ChebiTransform", "GocamTransform", "ChemblTransform",
]


def test_registry_keys_match_reference():
    assert sorted(DATA_SOURCES) == sorted(REFERENCE_KEYS)


def test_dispatcher_runs_sources_and_writes_kgx(spark, tmp_path):
    res = "/root/reference/tests/resources"
    input_dir = tmp_path / "raw"
    # stage reference fixtures under the dispatcher's per-source layout
    sd = input_dir / "StringTransform"
    sd.mkdir(parents=True)
    for f in ("gene2ensembl.gz", "gene_info.gz",
              "HUMAN_9606_idmapping.dat.gz",
              "9606.protein.links.full.v11.5.txt.gz"):
        shutil.copy(f"{res}/string/{f}", sd / f)
    dd = input_dir / "DrugCentralTransform"
    dd.mkdir()
    shutil.copy(
        f"{res}/drug_central/drug.target.interaction_SNIPPET.tsv.gz",
        dd / "drug.target.interaction_SNIPPET.tsv.gz",
    )
    pd_ = input_dir / "PharmGKB"
    pd_.mkdir()
    shutil.copy(f"{res}/relationships_SNIPPET.tsv", pd_ / "relationships.tsv")
    shutil.copy(f"{res}/pharmgkb_gene_SNIPPET.tsv", pd_ / "genes.tsv")
    shutil.copy(f"{res}/drugs.tsv", pd_ / "drugs.tsv")
    gd = input_dir / "GocamTransform"
    gd.mkdir()
    shutil.copy(
        f"{res}/gocams/lifted-go-cams-20200619_SNIPPET.nt",
        gd / "lifted-go-cams-20200619.nt",
    )
    (input_dir / "GoTransform").mkdir()

    out_dir = tmp_path / "transformed"
    ran = transform(
        spark, str(input_dir), str(out_dir),
        sources=["StringTransform", "DrugCentralTransform", "PharmGKB",
                 "GocamTransform", "GoTransform"],
    )
    for source, (nodes, edges) in ran.items():
        assert nodes.count() > 0, source
        assert edges.count() > 0, source
        assert os.path.isdir(out_dir / source / "nodes"), source
        assert os.path.isdir(out_dir / source / "edges"), source
    # golden shape carried through the dispatcher (test_string.py:84,115)
    s_nodes, s_edges = ran["StringTransform"]
    assert s_nodes.count() == 10 and s_edges.count() == 9


def test_unknown_source_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown source"):
        transform(spark, str(tmp_path), str(tmp_path), sources=["Nope"])


def test_zhou_without_rows_raises(spark, tmp_path):
    """No sidecar and no PDF: the missing INPUT surfaces as
    FileNotFoundError (the merge missing-file contract). Since r4 the
    PDF decode itself is runnable without tabula (pure-Python text
    layer, tests/test_zhou.py); NotImplementedError now marks only the
    no-text-layer/OCR case."""
    with pytest.raises(FileNotFoundError):
        DATA_SOURCES["ZhouTransform"](spark, str(tmp_path))


def test_dispatcher_runs_all_14_sources(spark, tmp_path):
    """Every registry key executes end-to-end through the dispatcher —
    the 'a user of the reference could run every transform they run
    today' bar — on the reference's own fixtures (plus synthesized
    Obograph/sidecar fixtures for the formats the reference has no
    test inputs for)."""
    import gzip
    import json

    res = "/root/reference/tests/resources"
    input_dir = tmp_path / "raw"

    def stage(source: str, mapping: dict[str, str]) -> None:
        d = input_dir / source
        d.mkdir(parents=True)
        for src, dst in mapping.items():
            shutil.copy(src, d / dst)

    stage("StringTransform", {
        f"{res}/string/{f}": f
        for f in ("gene2ensembl.gz", "gene_info.gz",
                  "HUMAN_9606_idmapping.dat.gz",
                  "9606.protein.links.full.v11.5.txt.gz")
    })
    stage("DrugCentralTransform", {
        f"{res}/drug_central/drug.target.interaction_SNIPPET.tsv.gz":
            "drug.target.interaction_SNIPPET.tsv.gz",
    })
    stage("PharmGKB", {
        f"{res}/relationships_SNIPPET.tsv": "relationships.tsv",
        f"{res}/pharmgkb_gene_SNIPPET.tsv": "genes.tsv",
        f"{res}/drugs.tsv": "drugs.tsv",
    })
    stage("GocamTransform", {
        f"{res}/gocams/lifted-go-cams-20200619_SNIPPET.nt":
            "lifted-go-cams-20200619.nt",
    })
    stage("TTDTransform", {
        f"{res}/P1-01-TTD_target_download_SNIPPET.txt":
            "P1-01-TTD_target_download_SNIPPET.txt",
    })
    stage("SARSCoV2GeneAnnot", {
        f"{res}/uniprot_sars-cov-2_SNIPPET.gpi": "uniprot_sars-cov-2.gpi",
        f"{res}/uniprot_sars-cov-2_SNIPPET.gpa": "uniprot_sars-cov-2.gpa",
    })
    stage("IntAct", {
        f"{res}/intact_test.xml": "intact_test.xml",
        f"{res}/intact_3_participants.xml": "intact_3_participants.xml",
    })
    stage("ScibiteCordTransform", {
        f"{res}/scibite_cord/{f}": f
        for f in ("pmc_json.zip", "pdf_json_part_1.zip",
                  "pdf_json_part_2.zip", "gene_info.gz",
                  "wikidata_country_codes.tsv", "cv19_scc_1_2.zip")
    })
    stage("ChemblTransform", {
        f"{res}/chembl/chembl_molecule_records.json": "molecules_data.json",
        f"{res}/chembl/chembl_assay_records.json": "assay_data.json",
        f"{res}/chembl/chembl_document_records.json": "document_data.json",
        f"{res}/chembl/chembl_activity_records.json": "activity_data.json",
    })
    # Zhou: synthesized tabula-JSON sidecar (reference ships no PDF fixture)
    from kg_covid_19_spark.sources.zhou import SIDECAR_FILE
    zd = input_dir / "ZhouTransform"
    zd.mkdir()
    (zd / SIDECAR_FILE).write_text(json.dumps([{"data": [
        [{"text": "Coronavirus"}, {"text": "Host Gene ID"},
         {"text": "Host Protein"}, {"text": "PubMed ID"}],
        [{"text": "SARS"}, {"text": "1234"}, {"text": "TBX4"},
         {"text": "32296183"}],
    ]}]))
    # ontologies: synthesized Obograph fixtures (reference ships none)
    from kg_covid_19_spark.sources.obojson import ONTOLOGY_FILES
    mini = {"graphs": [{"id": "mini", "nodes": [
        {"id": "http://purl.obolibrary.org/obo/MONDO_0005091",
         "lbl": "sars", "type": "CLASS"},
        {"id": "http://purl.obolibrary.org/obo/MONDO_0000001",
         "lbl": "disease", "type": "CLASS"},
    ], "edges": [
        {"sub": "http://purl.obolibrary.org/obo/MONDO_0005091",
         "pred": "is_a",
         "obj": "http://purl.obolibrary.org/obo/MONDO_0000001"},
    ]}]}
    for source in ("GoTransform", "HpTransform", "MondoTransform",
                   "ChebiTransform"):
        d = input_dir / source
        d.mkdir()
        fname = ONTOLOGY_FILES[source]
        if fname.endswith(".gz"):
            with gzip.open(d / fname, "wt") as fh:
                fh.write(json.dumps(mini))
        else:
            (d / fname).write_text(json.dumps(mini))

    out_dir = tmp_path / "transformed"
    ran = transform(spark, str(input_dir), str(out_dir))  # all 14
    assert sorted(ran) == sorted(REFERENCE_KEYS)
    for source, (nodes, edges) in ran.items():
        assert nodes.count() > 0, source
        # TTD's snippet legitimately yields 0 edges without an idmap
        # (no uniprot accessions resolve — pinned in test_ttd)
        if source != "TTDTransform":
            assert edges.count() > 0, source
        assert os.path.isdir(out_dir / source / "nodes"), source
