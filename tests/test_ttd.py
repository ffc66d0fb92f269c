"""TTD block-parser parity vs the reference's parsed-value goldens
(tests/test_ttd_transform.py:44-80)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_spark.sources.ttd import parse_ttd_blocks, ttd_transform

REF = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

SNIPPET = "P1-01-TTD_target_download_SNIPPET.txt"


def _parsed(spark):
    rows = parse_ttd_blocks(spark, f"{REF}/{SNIPPET}").collect()
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        out.setdefault(r.target_id, {})[r.abbrev] = [list(e) for e in r.entries]
    return out


def test_parsed_targets(spark):
    parsed = _parsed(spark)
    assert sorted(parsed.keys()) == ["T17514", "T47101"]


def test_parsed_values(spark):
    parsed = _parsed(spark)
    # goldens from tests/test_ttd_transform.py:55-72 (scalar entries are
    # single-element lists in our representation)
    assert parsed["T47101"]["TARGETID"] == [["T47101"]]
    assert parsed["T47101"]["GENENAME"] == [["FGFR1"]]
    assert parsed["T47101"]["DRUGINFO"] == [
        ["D09HNV", "Intedanib", "Approved"],
        ["D01PZD", "Romiplostim", "Approved"],
    ]
    assert parsed["T17514"]["UNIPROID"] == [
        ["INHBA_HUMAN", "INHBB_HUMAN", "INHBC_HUMAN", "INHBE_HUMAN"]
    ]


def test_transform_drug_nodes_and_quirk(spark):
    # no idmap → no protein matches; both targets have UNIPROID+DRUGINFO →
    # drug nodes only (and T47101's scalar UNIPROID would char-iterate,
    # reproducing ttd.py:178-185)
    nodes, edges = ttd_transform(spark, REF, SNIPPET, idmap_file=None)
    rows = nodes.collect()
    assert all(r.category == "biolink:Drug" for r in rows)
    drug_ids = sorted(r.id for r in rows)
    assert "ttd.drug:D09HNV" in drug_ids and "ttd.drug:D01PZD" in drug_ids
    assert edges.count() == 0
