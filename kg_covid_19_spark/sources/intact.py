"""IntAct miXML source (SURVEY.md S6, E3 pairwise expansion, J14
experiment-ref join).

Reference: kg_covid_19/transform_utils/intact/intact.py:81-364 — per-file
XML DOM walk emitting interactor nodes and one edge per pairwise
combination (i<j) of 2-3 interaction participants, with publication and
detection method joined from the experimentDescription elements.

Spark-first shape: one miXML document is one row (``binaryFile`` source),
so the whole parse is row-local inside ``mapInPandas`` — the J14
"experiment-ref join" never leaves the document, exactly like the
reference's per-file dicts. Scale = number of files; no shuffle anywhere.

Goldens: tests/test_intact.py:49-180 (5 nodes/8 edges; 3-participant
interaction → 3 edges; CHEBI already-prefixed id fix; experiment info).
"""

from __future__ import annotations

from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

TYPE_TO_CATEGORY = {
    "protein": "biolink:Protein",
    "peptide": "biolink:Protein",
    "rna": "biolink:RNA",
    "mrna": "biolink:RNA",
    "snrna": "biolink:RNA",
    "nucleic acid": "biolink:MolecularEntity",
    "small molecule": "biolink:Drug",
}
DB_TO_PREFIX = {
    "uniprot": "UniProtKB",
    "uniprotkb": "UniProtKB",
    "chebi": "CHEBI",
    "ensembl": "ENSEMBL",
    "ddbj/embl/genbank": "NCBIProtein",
    "pubmed": "PMID",
    "intact": "INTACT",
}

NODE_COLS = ["id", "name", "category", "ncbi_taxid", "provided_by"]
EDGE_COLS = [
    "subject", "predicate", "object", "relation", "provided_by", "type",
    "publication", "num_participants", "association_type",
    "detection_method", "subj_exp_role", "obj_exp_role",
]

INTACT_NODE_SCHEMA = StructType([StructField(c, StringType(), True) for c in NODE_COLS])
INTACT_EDGE_SCHEMA = StructType([StructField(c, StringType(), True) for c in EDGE_COLS])


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _iter_local(elem, name: str):
    for e in elem.iter():
        if _local(e.tag) == name:
            yield e


def _first_local(elem, name: str):
    for e in _iter_local(elem, name):
        return e
    return None


def _short_label(elem) -> str:
    lab = _first_local(elem, "shortLabel") if elem is not None else None
    return (lab.text or "") if lab is not None else ""


def parse_intact_xml(data: bytes) -> tuple[list[list[str]], list[list[str]]]:
    """One miXML document → (node rows, edge rows), reference semantics."""
    root = ElementTree.fromstring(data)

    nodes_dict: dict[str, list[str]] = {}
    for interactor in _iter_local(root, "interactor"):
        int_id = interactor.attrib.get("id", "")
        this_id = ""
        pr = _first_local(interactor, "primaryRef")
        if pr is not None:
            db = pr.attrib.get("db", "")
            id_val = pr.attrib.get("id", "")
            prefix = DB_TO_PREFIX.get(db, "")
            # chebi ids sometimes arrive already prefixed (intact.py:275-280)
            if db == "chebi" and id_val.startswith("CHEBI:"):
                this_id = id_val
            else:
                this_id = f"{prefix}:{id_val}"
        org = _first_local(interactor, "organism")
        tax_id = org.attrib.get("ncbiTaxId", "NA") if org is not None else "NA"
        names = _first_local(interactor, "names")
        name = _short_label(names)
        itype = _first_local(interactor, "interactorType")
        type_label = _short_label(itype).lower()
        category = TYPE_TO_CATEGORY.get(type_label, "biolink:Protein")
        nodes_dict[int_id] = [this_id, name, category, tax_id, "intact"]

    exp_dict: dict[str, dict[str, str]] = {}
    for experiment in _iter_local(root, "experimentDescription"):
        exp_id = experiment.attrib.get("id")
        if exp_id is None:
            continue
        entry: dict[str, str] = {}
        bibref = _first_local(experiment, "bibref")
        if bibref is not None:
            p_ref = _first_local(bibref, "primaryRef")
            if p_ref is not None:
                db = p_ref.attrib.get("db", "")
                this_id = p_ref.attrib.get("id", "")
                entry["publication"] = f"{DB_TO_PREFIX.get(db, db)}:{this_id}"
        method = _first_local(experiment, "interactionDetectionMethod")
        if method is not None:
            label = _short_label(method)
            if label:
                entry["detection_method"] = label
        exp_dict[exp_id] = entry

    edges: list[list[str]] = []
    for interaction in _iter_local(root, "interaction"):
        itype = _first_local(interaction, "interactionType")
        interaction_type_str = _short_label(itype)
        participants = list(_iter_local(interaction, "participant"))
        if len(participants) not in (2, 3):
            continue
        exp_ref_el = _first_local(interaction, "experimentRef")
        experiment_ref = (exp_ref_el.text or "") if exp_ref_el is not None else ""
        exp = exp_dict.get(experiment_ref, {})
        detection_method = exp.get("detection_method", "")
        publication = exp.get("publication", "")

        def node_of(p):
            ref = _first_local(p, "interactorRef")
            if ref is None:
                return None
            entry = nodes_dict.get(ref.text or "")
            return entry[0] if entry else None

        def role_of(p):
            er = _first_local(p, "experimentalRole")
            return _short_label(er)

        n = len(participants)
        for i in range(n):
            for j in range(i + 1, n):
                n1, n2 = node_of(participants[i]), node_of(participants[j])
                if n1 is None or n2 is None:
                    continue
                edges.append([
                    n1, "biolink:interacts_with", n2, "RO:0002437", "intact",
                    "biolink:Association", publication, str(n),
                    interaction_type_str, detection_method,
                    role_of(participants[i]), role_of(participants[j]),
                ])

    return list(nodes_dict.values()), edges


def intact_transform(spark: SparkSession, path_glob: str,
                     ) -> tuple[DataFrame, DataFrame]:
    """miXML files → (nodes, edges). Each file parses row-locally; at
    10^6 files this is a pure map over the binaryFile scan."""
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def parse_nodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                nodes, _ = parse_intact_xml(bytes(data))
                rows.extend(nodes)
            yield pd.DataFrame(rows, columns=NODE_COLS)

    def parse_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                _, edges = parse_intact_xml(bytes(data))
                rows.extend(edges)
            yield pd.DataFrame(rows, columns=EDGE_COLS)

    return (
        files.mapInPandas(parse_nodes, INTACT_NODE_SCHEMA),
        files.mapInPandas(parse_edges, INTACT_EDGE_SCHEMA),
    )
