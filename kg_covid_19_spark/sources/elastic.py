"""Elasticsearch scroll scan — the S2 source (reference:
utils/download_utils.py:69-127).

Reference behavior: ``elasticsearch.helpers.scan`` drives the scroll
API — an initial ``_search`` opens a cursor returning a page of hits
plus a ``scroll_id``, each subsequent ``_scroll`` call with that id
returns the next page (possibly a fresh id), and the loop terminates on
the first empty page; the accumulated hit objects are dumped as one
JSON records file (``elastic_search_query`` → ``download_from_api``).

Spark-first shape: a single scroll cursor is inherently serial (each
page request carries the cursor the previous response returned), so the
100-TB path is Elasticsearch's OWN export-parallelism mechanism —
**sliced scroll**: N independent cursors, each covering a disjoint
server-assigned slice of the index. ``elastic_scroll_scan`` drives one
slice cursor per Spark task via ``mapInPandas`` (Arrow-batched, no
per-row Python between pages), which is exactly how es-hadoop and
friends parallelize an index export.

The transport is injected as a picklable factory, so the protocol loop
is EXERCISED, not asserted: this sandbox (no elasticsearch package, no
cluster) runs the identical search/scroll/slice logic against
``LocalJsonTransport`` — a file-backed server-side emulation with real
scroll-id handoff and slice partitioning — while a deployment passes
``es_transport`` (import-gated on the real client).
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def scroll_records(
    transport,
    index: str,
    query: dict,
    page_size: int = 1000,
    scroll: str = "1m",
) -> list[dict]:
    """The reference's ``elastic_search_query`` accumulate loop
    (download_utils.py:92-127), against an injected transport:

    * ``transport.search(index, body, size, scroll)`` →
      ``{"_scroll_id": ..., "hits": {"hits": [...]}}``
    * ``transport.scroll(scroll_id, scroll)`` → same shape (the id in
      each response supersedes the previous one — real ES may rotate it)
    * stop on the first empty page; hit order is preserved
      (preserve_order=True is the reference's setting).
    """
    records: list[dict] = []
    resp = transport.search(index=index, body=query, size=page_size,
                            scroll=scroll)
    while True:
        hits = resp.get("hits", {}).get("hits", [])
        if not hits:
            break
        records.extend(hits)
        resp = transport.scroll(scroll_id=resp["_scroll_id"],
                                scroll=scroll)
    return records


def elastic_scroll_scan(
    spark: SparkSession,
    make_transport: Callable[[], object],
    index: str,
    query: dict | None = None,
    n_slices: int = 4,
    page_size: int = 1000,
    scroll: str = "1m",
) -> DataFrame:
    """Distributed index export: one sliced-scroll cursor per task.

    Each of the ``n_slices`` tasks adds ES's ``slice: {id, max}`` clause
    to the query and runs the full ``scroll_records`` loop on its own
    cursor — disjoint server-side slices, no coordination, no shuffle.
    Returns (_id string, _source string) with ``_source`` as canonical
    JSON; callers apply ``from_json`` with their index's schema, keeping
    schema knowledge out of the transport layer. ``n_slices=1`` omits
    the slice clause (ES requires max ≥ 2)."""
    base_query = dict(query or {"query": {"match_all": {}}})

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for sid in pdf["id"]:
                q = dict(base_query)
                if n_slices > 1:
                    q["slice"] = {"id": int(sid), "max": n_slices}
                recs = scroll_records(
                    make_transport(), index, q, page_size, scroll
                )
                yield pd.DataFrame(
                    {
                        "_id": [str(r["_id"]) for r in recs],
                        "_source": [
                            json.dumps(r["_source"], sort_keys=True)
                            for r in recs
                        ],
                    }
                )

    return (
        spark.range(n_slices)
        .repartition(n_slices)
        .mapInPandas(fetch, "_id string, _source string")
    )


class LocalJsonTransport:
    """File-backed transport emulating the server side of the scroll
    protocol — scroll-id handoff (ids rotate per page and a stale id is
    rejected, as real ES may do), page_size paging, match_all plus the
    ``slice`` clause (documents are assigned to slices by a stable hash
    of _id, mirroring ES's default _id-based slicing).

    Documents file: a JSON array of ``{"_id": ..., "_source": {...}}``
    objects (exactly what the reference's records dump looks like)."""

    def __init__(self, docs_path: str) -> None:
        with open(docs_path) as fh:
            self._docs = json.load(fh)
        self._cursors: dict[str, tuple[list[dict], int]] = {}
        self._next_id = 0

    def _slice_filter(self, docs: list[dict], clause: dict) -> list[dict]:
        import hashlib

        sid, smax = int(clause["id"]), int(clause["max"])
        return [
            d for d in docs
            if int(hashlib.md5(str(d["_id"]).encode()).hexdigest(), 16)
            % smax == sid
        ]

    def _page(self, docs: list[dict], pos: int, size: int) -> dict:
        sid = f"scroll-{self._next_id}"
        self._next_id += 1
        self._cursors[sid] = (docs, pos + size)
        return {
            "_scroll_id": sid,
            "hits": {"hits": docs[pos:pos + size]},
        }

    def search(self, index: str, body: dict, size: int,
               scroll: str) -> dict:
        docs = self._docs
        if "slice" in body:
            docs = self._slice_filter(docs, body["slice"])
        self._page_size = size
        return self._page(docs, 0, size)

    def scroll(self, scroll_id: str, scroll: str) -> dict:
        if scroll_id not in self._cursors:
            raise KeyError(f"unknown or expired scroll id {scroll_id!r}")
        docs, pos = self._cursors.pop(scroll_id)  # ids are single-use
        return self._page(docs, pos, self._page_size)


def es_transport(hosts: list[str]):
    """Real-cluster factory: returns a thin adapter over the official
    client exposing the same search/scroll surface. Import-gated — the
    sandbox ships no elasticsearch package."""
    try:
        import elasticsearch  # type: ignore
    except ImportError as exc:  # pragma: no cover - no client here
        raise NotImplementedError(
            "elasticsearch client not installed; use LocalJsonTransport "
            "or install elasticsearch"
        ) from exc

    class _Adapter:  # pragma: no cover - needs a live cluster
        def __init__(self) -> None:
            self._es = elasticsearch.Elasticsearch(hosts=hosts)

        def search(self, index, body, size, scroll):
            return self._es.search(index=index, body=body, size=size,
                                   scroll=scroll)

        def scroll(self, scroll_id, scroll):
            return self._es.scroll(scroll_id=scroll_id, scroll=scroll)

    return _Adapter()
