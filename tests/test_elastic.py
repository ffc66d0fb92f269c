"""Elasticsearch scroll scan (S2): the reference's accumulate loop
(download_utils.py:92-127) exercised against a protocol-faithful local
transport, and the sliced-scroll distributed export on top of it."""

from __future__ import annotations

import json

import pytest

from kg_covid_19_spark.sources.elastic import (
    LocalJsonTransport,
    elastic_scroll_scan,
    es_transport,
    scroll_records,
)

DOCS = [
    {"_id": f"d{i:03d}", "_source": {"n": i, "text": f"doc {i}"}}
    for i in range(23)
]


@pytest.fixture()
def docs_path(tmp_path):
    p = tmp_path / "index.json"
    p.write_text(json.dumps(DOCS))
    return str(p)


def test_scroll_loop_pages_and_preserves_order(docs_path):
    t = LocalJsonTransport(docs_path)
    got = scroll_records(t, "idx", {"query": {"match_all": {}}},
                         page_size=5)
    # 23 docs at page_size 5 → 5 pages + the empty terminator
    assert got == DOCS
    assert t._next_id == 6  # search + 5 scroll responses issued ids


def test_scroll_ids_are_single_use(docs_path):
    """A stale cursor id must be rejected — the loop must thread each
    response's id forward (real ES rotates ids; reusing an old one is
    the classic scroll bug)."""
    t = LocalJsonTransport(docs_path)
    first = t.search(index="idx", body={}, size=5, scroll="1m")
    t.scroll(scroll_id=first["_scroll_id"], scroll="1m")
    with pytest.raises(KeyError):
        t.scroll(scroll_id=first["_scroll_id"], scroll="1m")


def test_sliced_scan_unions_to_full_index(spark, docs_path):
    """4 independent slice cursors, one per task: disjoint, exhaustive,
    deterministic — the distributed export equals the single-cursor
    reference accumulate."""
    df = elastic_scroll_scan(
        spark,
        lambda: LocalJsonTransport(docs_path),
        "idx",
        n_slices=4,
        page_size=4,
    )
    rows = {r["_id"]: r["_source"] for r in df.collect()}
    assert len(rows) == len(DOCS)  # disjoint slices, no dup ids
    want = {
        d["_id"]: json.dumps(d["_source"], sort_keys=True) for d in DOCS
    }
    assert rows == want


def test_single_slice_scan_omits_slice_clause(spark, docs_path):
    df = elastic_scroll_scan(
        spark,
        lambda: LocalJsonTransport(docs_path),
        "idx",
        n_slices=1,
        page_size=7,
    )
    assert df.count() == len(DOCS)


def test_real_client_factory_is_import_gated():
    with pytest.raises(NotImplementedError):
        es_transport(["http://localhost:9200"])
