"""Zhou host-protein transform (zhou_transform.py:96-150 semantics;
the reference ships no zhou test — goldens derived from its fixed
constant tables)."""

from __future__ import annotations

import pytest

from kg_covid_19_spark.sources.zhou import (
    TABLE_COLUMNS,
    read_pdf_tables,
    zhou_transform,
)


def _rows(spark, data):
    return spark.createDataFrame(
        data, ", ".join(f"`{c}` string" for c in TABLE_COLUMNS)
    )


def test_zhou_golden_rows(spark):
    rows = _rows(
        spark,
        [
            ("SARS", "1234", "TBX4", "32296183"),
            ("MERS", "999", "ACE2", "32296183"),
        ],
    )
    nodes, edges = zhou_transform(spark, rows)
    assert sorted(tuple(r) for r in nodes.collect()) == [
        ("NCBIGene:1234", "TBX4", "biolink:Gene", "zhou_host_proteins"),
        ("NCBIGene:999", "ACE2", "biolink:Gene", "zhou_host_proteins"),
        ("NCBITaxon:1335626", "MERS", "biolink:OrganismalEntity",
         "zhou_host_proteins"),
        ("NCBITaxon:227859", "SARS", "biolink:OrganismalEntity",
         "zhou_host_proteins"),
    ]
    assert sorted(tuple(r) for r in edges.collect()) == [
        ("NCBIGene:1234", "biolink:interacts_with", "NCBITaxon:227859",
         "RO:0002437", "zhou_host_proteins", "biolink:Association",
         "PMID:32296183"),
        ("NCBIGene:999", "biolink:interacts_with", "NCBITaxon:1335626",
         "RO:0002437", "zhou_host_proteins", "biolink:Association",
         "PMID:32296183"),
    ]


def test_zhou_unknown_coronavirus_raises(spark):
    nodes, _ = zhou_transform(spark, _rows(spark, [("NOPE", "1", "X", "2")]))
    with pytest.raises(Exception, match="Can't find info for coronavirus"):
        nodes.collect()


def test_pdf_decode_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        read_pdf_tables(spark, "/nonexistent.pdf")


def _cells(*texts):
    return [{"text": t} for t in texts]


def test_sidecar_reader_multi_page(spark, tmp_path):
    """tabula-JSON sidecar: header = first page's first row; all other
    rows of all pages zip against it (utils/transform_utils.py:28-68)."""
    import json

    from kg_covid_19_spark.sources.zhou import read_table_sidecar

    sidecar = [
        {"data": [
            _cells("Coronavirus", "Host Gene ID", "Host Protein", "PubMed ID"),
            _cells("SARS", "1234", "TBX4", "32296183"),
            _cells("MERS", "999", "ACE2", "32296183"),
        ]},
        {"data": [
            _cells("IBV", "555", "FURIN", "31226023"),
        ]},
    ]
    p = tmp_path / "tables.json"
    p.write_text(json.dumps(sidecar))
    rows = read_table_sidecar(spark, str(p))
    assert rows.columns == [
        "Coronavirus", "Host Gene ID", "Host Protein", "PubMed ID"
    ]
    got = sorted(tuple(r) for r in rows.collect())
    assert got == [
        ("IBV", "555", "FURIN", "31226023"),
        ("MERS", "999", "ACE2", "32296183"),
        ("SARS", "1234", "TBX4", "32296183"),
    ]


def test_registry_zhou_runs_from_sidecar(spark, tmp_path):
    """With the sidecar present, the Zhou registry entry runs end-to-end
    without tabula — 14/14 sources executable."""
    import json

    from kg_covid_19_spark.sources.registry import DATA_SOURCES
    from kg_covid_19_spark.sources.zhou import SIDECAR_FILE

    src = tmp_path / "ZhouTransform"
    src.mkdir()
    sidecar = [
        {"data": [
            _cells("Coronavirus", "Host Gene ID", "Host Protein", "PubMed ID"),
            _cells("SARS", "1234", "TBX4", "32296183"),
        ]},
    ]
    (src / SIDECAR_FILE).write_text(json.dumps(sidecar))
    nodes, edges = DATA_SOURCES["ZhouTransform"](spark, str(src))
    assert sorted(tuple(r) for r in nodes.collect()) == [
        ("NCBIGene:1234", "TBX4", "biolink:Gene", "zhou_host_proteins"),
        ("NCBITaxon:227859", "SARS", "biolink:OrganismalEntity",
         "zhou_host_proteins"),
    ]
    assert edges.count() == 1
