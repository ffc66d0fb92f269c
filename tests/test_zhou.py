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


def _tiny_pdf() -> bytes:
    """A real (tiny) two-page PDF with text-layer content streams:
    page 1 header+row uncompressed, page 2 row FlateDecode-compressed
    and using TJ kerned fragments + an octal escape — the op subset the
    fallback extractor documents."""
    import zlib

    c1 = (b"BT /F1 10 Tf\n"
          b"0 760 Td (Coronavirus) Tj (Host Gene ID) Tj "
          b"(Host Protein) Tj (PubMed ID) Tj\n"
          b"0 -20 Td (SARS) Tj (1234) Tj (TBX4) Tj (32296183) Tj\n"
          b"ET")
    c2_raw = (b"BT 0 760 Td [(ME) (RS)] TJ (999) Tj "
              b"[(AC) (E\062)] TJ (32296183) Tj ET")
    c2 = zlib.compress(c2_raw)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj",
        b"5 0 obj << /Length %d >> stream\n%s\nendstream endobj"
        % (len(c1), c1),
        b"6 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj"
        % (len(c2), c2),
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF\n"


def test_pdf_fallback_extracts_table_end_to_end(spark, tmp_path):
    """Without tabula the pure-Python text-layer branch must carry a
    real PDF byte string all the way through zhou_transform."""
    pdf_path = str(tmp_path / "zhou.pdf")
    with open(pdf_path, "wb") as fh:
        fh.write(_tiny_pdf())
    rows = read_pdf_tables(spark, pdf_path, pages=(1, 2))
    assert rows.columns == TABLE_COLUMNS
    assert sorted(tuple(r) for r in rows.collect()) == [
        ("MERS", "999", "ACE2", "32296183"),
        ("SARS", "1234", "TBX4", "32296183"),
    ]
    nodes, edges = zhou_transform(spark, rows)
    assert edges.count() == 2
    assert {r["object"] for r in edges.collect()} == {
        "NCBITaxon:227859", "NCBITaxon:1335626",
    }


def test_pdf_without_text_layer_still_raises(spark, tmp_path):
    """Scanned-image PDFs (no BT/ET text ops) stay behind the explicit
    NotImplementedError seam — that path genuinely needs OCR."""
    pdf_path = str(tmp_path / "scanned.pdf")
    with open(pdf_path, "wb") as fh:
        fh.write(b"%PDF-1.4\n1 0 obj << >> endobj\n%%EOF\n")
    with pytest.raises(NotImplementedError):
        read_pdf_tables(spark, pdf_path)


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


def test_flatedecode_detected_through_nested_dict():
    """A nested dict (/DecodeParms <<...>>) between /FlateDecode and
    `stream` must not hide the filter token (ADVICE r4): detection
    scans the whole still-open object dictionary via '<<'/'>>'
    balancing, not just the substring after the LAST '<<'."""
    import zlib

    from kg_covid_19_spark.sources.zhou import _pdf_content_streams

    body = zlib.compress(b"BT (hello) Tj ET")
    pdf = b"%PDF-1.4\n" + (
        b"1 0 obj << /Length %d /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 1 /Columns 4 >> >> stream\n"
        b"%s\nendstream endobj\n" % (len(body), body)
    ) + b"%%EOF\n"
    assert _pdf_content_streams(pdf) == [b"BT (hello) Tj ET"]
