"""SciBite CORD parity: the Spark plans must emit exactly the node/edge
multisets of a faithful single-threaded transcription of the reference's
seen-set streaming algorithm (scibite_cord.py:140-340) run on the
reference's own fixtures — this is the P/R-vs-reference-triples check
(north_rule) with P = R = 1.0 modulo the pinned contraction table."""

from __future__ import annotations

import gzip
import io
import json
import os
import re
import zipfile

import pytest

from kg_covid_19_spark.sources.scibite import (
    COOC_SOURCE,
    SOURCE,
    scibite_transform,
)

FIX = "/root/reference/tests/resources/scibite_cord"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not available"
)

GENENAMES_IRI = "http://www.genenames.org/cgi-bin/gene_symbol_report?match="
CMAP = {
    "CHEMBL.COMPOUND": "https://www.ebi.ac.uk/chembl/compound_report_card/",
    "MESH": "https://id.nlm.nih.gov/mesh/",
    "UniProtKB": "https://www.uniprot.org/uniprot/",
    "UniProtKB#purl": "http://purl.uniprot.org/uniprot/",
    "WD": "http://www.wikidata.org/entity/",
}


def _load_maps():
    gene_map = {}
    with gzip.open(f"{FIX}/gene_info.gz", "rt") as fh:
        for line in fh:
            rec = line.split("\t")
            if rec[0] != "9606":
                continue
            gene_map.setdefault(rec[2], rec[1])
    country_map = {}
    with open(f"{FIX}/wikidata_country_codes.tsv") as fh:
        for line in fh:
            if line.startswith("item"):
                continue
            rec = line.rstrip().split("\t")
            country_map[rec[1]] = (rec[0], rec[2])
    return gene_map, country_map


def _contract_plain(t: str) -> str:
    if re.match(r"^http[s]?://", t):
        m = re.match(r"^https?://purl\.obolibrary\.org/obo/([A-Za-z0-9]+)_(.+)$", t)
        if m:
            return f"{m.group(1)}:{m.group(2)}"
        for prefix, base in sorted(CMAP.items(), key=lambda kv: -len(kv[1])):
            if t.startswith(base):
                return f"{prefix.split('#')[0]}:{t[len(base):]}"
        return t
    if re.match(r"^[^ :]+:[^/ :]+$", t):
        return t
    return f":{t}"


def _term_fields(t, gene_map, country_map):
    """(curie, name, category) — scibite_cord.py:189-218 incl. the
    1-tuple name bug (non-country names always write '')."""
    if GENENAMES_IRI in t:
        symbol = t.split("=")[-1]
        curie = (
            f"NCBIGene:{gene_map[symbol]}"
            if symbol in gene_map
            else f"HGNC:{symbol}"
        )
        return curie, "", "biolink:OntologyClass"
    if len(t) == 2:
        if t in country_map:
            item, name = country_map[t]
            return _contract_plain(item), name, "biolink:NamedThing"
        return _contract_plain(t), "", "biolink:NamedThing"
    return _contract_plain(t), "", "biolink:OntologyClass"


def _reference_oracle():
    """Transcription of ScibiteCordTransform.run() control flow."""
    gene_map, country_map = _load_maps()
    seen = set()
    anno_nodes, anno_edges, cooc_nodes, cooc_edges = [], [], [], []

    for zname in ("pmc_json.zip", "pdf_json_part_1.zip", "pdf_json_part_2.zip"):
        with zipfile.ZipFile(f"{FIX}/{zname}") as zf:
            for member in sorted(zf.namelist()):
                base = member.rsplit("/", 1)[-1]
                if not base or base.startswith(".") or not member.endswith(".json"):
                    continue
                doc = json.loads(zf.read(member))
                terms = set()
                title = None
                if "metadata" in doc:
                    title = re.sub(r"[\n\t]", " ", doc["metadata"]["title"])
                    for sec in [doc["metadata"]]:
                        for hits in sec.get("termite_hits", {}).values():
                            terms.update(h["id"] for h in hits)
                for sec in doc.get("abstract", []) + doc.get("body_text", []):
                    for hits in sec.get("termite_hits", {}).values():
                        terms.update(h["id"] for h in hits)
                pid = doc["paper_id"]
                anno_nodes.append(
                    (f"CORD:{pid}", f"{title}", "biolink:Publication", "", SOURCE)
                )
                seen.add(pid)
                for t in sorted(terms):
                    curie, name, cat = _term_fields(t, gene_map, country_map)
                    if t not in seen:
                        anno_nodes.append((curie, name, cat, "", SOURCE))
                        seen.add(curie)
                    anno_edges.append(
                        (
                            f"CORD:{pid}", "biolink:mentions", curie,
                            "SIO:000255", SOURCE, "biolink:Association",
                        )
                    )

    with zipfile.ZipFile(f"{FIX}/cv19_scc_1_2.zip") as zf:
        import pandas as pd

        df = pd.read_csv(
            io.BytesIO(zf.read("cv19_scc.tsv")), sep="\t", encoding="utf-8"
        )
    for _, rec in df.iterrows():
        if pd.isna(rec["entity_uris"]):
            continue
        terms = set(rec["entity_uris"].split("|"))
        pid = rec["document_id"]
        if pid.endswith(".xml"):
            pid = pid.replace(".xml", "")
        paper_curie = f"CORD:{pid}"
        if pid not in seen:
            cooc_nodes.append(
                (paper_curie, "", "biolink:Publication", "", COOC_SOURCE)
            )
            seen.add(pid)
        for t in sorted(terms):
            curie, name, cat = _term_fields(t, gene_map, country_map)
            if t not in seen:
                cooc_nodes.append((curie, name, cat, "", COOC_SOURCE))
                seen.add(curie)
                if (curie, paper_curie) not in seen:
                    cooc_edges.append(
                        (
                            curie, "biolink:correlated_with", paper_curie,
                            "RO:0002610", COOC_SOURCE, "biolink:Association",
                        )
                    )
                    seen.add((curie, paper_curie))
    import pandas as pd  # noqa: F811

    return anno_nodes, anno_edges, cooc_nodes, cooc_edges


def test_scibite_matches_reference_streaming_semantics(spark):
    want = _reference_oracle()
    got = scibite_transform(spark, FIX)
    for i, label in enumerate(
        ("anno_nodes", "anno_edges", "cooc_nodes", "cooc_edges")
    ):
        g = sorted(tuple(r) for r in got[i].collect())
        w = sorted(want[i])
        assert g == w, (
            f"{label}: spark={len(g)} oracle={len(w)}; first diff: "
            f"{next(((a, b) for a, b in zip(g, w) if a != b), (g[:2], w[:2]))}"
        )


def test_scibite_triple_pr_vs_reference(spark):
    """Explicit P/R on (subject, predicate, object) triples."""
    want = _reference_oracle()
    got = scibite_transform(spark, FIX)
    ref = {tuple(e[:3]) for e in want[1]} | {tuple(e[:3]) for e in want[3]}
    ours = {
        tuple(r)[:3] for r in got[1].collect()
    } | {tuple(r)[:3] for r in got[3].collect()}
    tp = len(ref & ours)
    precision = tp / len(ours)
    recall = tp / len(ref)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_cmap_covers_every_fixture_iri_family(spark):
    """Contraction-table completeness (the PARITY.md caveat, as a test):
    every http(s) term IRI across ALL CORD fixture zips must be claimed
    by exactly one contraction rule — the OBO PURL regex, a CMAP base,
    or the gene-symbol branch (GENENAMES_IRI). A fixture family falling
    through to raw-IRI passthrough fails here instead of silently
    surviving contraction. Includes the one registry-ambiguous family:
    http://purl.uniprot.org/uniprot/ must be present (it is what makes
    this non-vacuous) and must contract to UniProtKB: via the
    PRODUCTION column expression, matching the reference's own
    downstream algebra which only fires on UniProtKB: CURIEs
    (collapse_uniprot_curie, transform_utils.py:205-218)."""
    from pyspark.sql import functions as F

    from kg_covid_19_spark.sources.scibite import (
        _OBO_RE,
        contract_plain,
        zip_json_docs,
    )
    from kg_covid_19_spark.sources.scibite import CMAP as PROD_CMAP
    from kg_covid_19_spark.sources.scibite import (
        GENENAMES_IRI as PROD_GENENAMES,
    )

    zips = [
        f"{FIX}/{f}" for f in sorted(os.listdir(FIX)) if f.endswith(".zip")
        and f != "cv19_scc_1_2.zip"  # co-occurrence table, no termite ids
    ]
    docs = zip_json_docs(spark, zips)
    iris = sorted(
        r["t"]
        for r in docs.select(F.explode("terms").alias("t"))
        .filter(F.col("t").startswith("http"))
        .distinct()
        .collect()
    )
    assert iris, "fixtures contained no IRI-form terms"

    bases = tuple(PROD_CMAP.values()) + (PROD_GENENAMES,)
    uncovered = [
        i for i in iris
        if not re.match(_OBO_RE, i) and not i.startswith(bases)
    ]
    assert uncovered == [], uncovered

    purl = [i for i in iris if i.startswith("http://purl.uniprot.org/uniprot/")]
    assert purl, "registry-ambiguous purl.uniprot family missing from fixtures"
    got = (
        spark.createDataFrame([(i,) for i in purl], "iri string")
        .select(contract_plain(F.col("iri")).alias("c"))
        .collect()
    )
    for i, r in zip(purl, got):
        assert r["c"] == "UniProtKB:" + i.rsplit("/", 1)[-1], (i, r["c"])
