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
    with pytest.raises(NotImplementedError):
        DATA_SOURCES["ZhouTransform"](spark, str(tmp_path))
