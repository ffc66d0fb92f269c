"""Source registry + transform dispatcher — the engine's analog of the
reference CLI's `run.py transform [-s Source]` entry point.

Reference: kg_covid_19/transform.py:23-38 keys 14 `Transform` classes
by name; `transform(input_dir, output_dir, sources)` instantiates each
and calls `run()`, which writes `<output_dir>/<source>/{nodes,edges}.tsv`
(transform.py:41-66). Here each registry value is an adapter
``(spark, input_dir, **kw) -> (nodes_df, edges_df)`` over the same
input-directory layout (each adapter's default filenames are the
reference run()'s defaults where the fixture ships under that name),
and :func:`transform` writes the same per-source KGX TSV tree.

The four ontology entries share one implementation keyed by ontology
name, exactly like the reference maps Go/Hp/Mondo/Chebi to a single
`OntologyTransform` (transform.py:32-35). Zhou's PDF decode is stubbed
(see sources/zhou.py) — calling its adapter without pre-extracted rows
raises NotImplementedError, mirroring the missing tabula dependency.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .chembl import chembl_transform
from .obojson import ONTOLOGY_FILES, ontology_file_transform
from .gene_annot import gene_annot_transform
from .intact import intact_transform
from .kgx import write_kgx
from .ontology import ontology_edges, ontology_nodes
from .pharmgkb import pharmgkb_transform
from .rdf import gocam_transform
from .reference_parity import drug_central_transform, string_transform
from .scibite import scibite_transform
from .ttd import ttd_transform
from .zhou import (
    SIDECAR_FILE,
    read_pdf_tables,
    read_table_sidecar,
    zhou_transform,
)

TransformFn = Callable[..., tuple[DataFrame, DataFrame]]


def _scibite(spark: SparkSession, input_dir: str, **kw):
    an, ae, cn, ce = scibite_transform(spark, input_dir, **kw)
    return an.unionByName(cn), ae.unionByName(ce)


def _ontology_for(source: str) -> TransformFn:
    """Go/Hp/Mondo/Chebi adapter: parse the source's real obojson file
    (sources/obojson.py, reference ontology_transform.py:48-71) when it
    exists under the input dir; fall back to the synthesized broadcast
    ontology (S8) when it doesn't — the hermetic-sandbox analog of the
    reference's downloaded hp/go-plus/mondo/chebi files."""

    def adapter(spark: SparkSession, input_dir: str, **kw):
        path = f"{input_dir}/{ONTOLOGY_FILES[source]}"
        if os.path.exists(path):
            return ontology_file_transform(spark, input_dir, source)
        return ontology_nodes(spark), ontology_edges(spark)

    return adapter


def _gocam(spark: SparkSession, input_dir: str,
           data_file: str = "lifted-go-cams-20200619.nt", **kw):
    nodes, edges = gocam_transform(spark, f"{input_dir}/{data_file}", **kw)
    return nodes.drop("properties"), edges


def _intact(spark: SparkSession, input_dir: str, **kw):
    return intact_transform(spark, f"{input_dir}/*.xml", **kw)


def _gene_annot(spark: SparkSession, input_dir: str,
                gpi: str = "uniprot_sars-cov-2.gpi",
                gpa: str = "uniprot_sars-cov-2.gpa", **kw):
    return gene_annot_transform(
        spark, f"{input_dir}/{gpi}", f"{input_dir}/{gpa}", **kw
    )


def _pharmgkb(spark: SparkSession, input_dir: str,
              relationships: str = "relationships.tsv",
              genes: str = "genes.tsv", drugs: str = "drugs.tsv", **kw):
    return pharmgkb_transform(
        spark,
        f"{input_dir}/{relationships}",
        f"{input_dir}/{genes}",
        f"{input_dir}/{drugs}",
        **kw,
    )


def _chembl(spark: SparkSession, input_dir: str, **kw):
    files = {
        k: f"{input_dir}/{k}.json"
        for k in ("molecules_data", "assay_data", "document_data",
                  "activity_data")
    }
    return chembl_transform(spark, files, **kw)


def _zhou(spark: SparkSession, input_dir: str, rows: DataFrame | None = None,
          **kw):
    if rows is None:
        sidecar = f"{input_dir}/{SIDECAR_FILE}"
        if os.path.exists(sidecar):
            # pre-extracted tabula JSON → runnable without the PDF libs
            rows = read_table_sidecar(spark, sidecar)
        else:
            # pure-Python text-layer fallback (sources/zhou.py) — raises
            # FileNotFoundError on a missing PDF, NotImplementedError
            # only for a PDF with no extractable text layer (needs OCR)
            rows = read_pdf_tables(
                spark, f"{input_dir}/41421_2020_153_MOESM1_ESM.pdf"
            )
    return zhou_transform(spark, rows, **kw)


# reference transform.py:23-38, same keys
DATA_SOURCES: dict[str, TransformFn] = {
    "ZhouTransform": _zhou,
    "DrugCentralTransform": drug_central_transform,
    "TTDTransform": ttd_transform,
    "StringTransform": string_transform,
    "ScibiteCordTransform": _scibite,
    "PharmGKB": _pharmgkb,
    "SARSCoV2GeneAnnot": _gene_annot,
    "IntAct": _intact,
    "GoTransform": _ontology_for("GoTransform"),
    "HpTransform": _ontology_for("HpTransform"),
    "MondoTransform": _ontology_for("MondoTransform"),
    "ChebiTransform": _ontology_for("ChebiTransform"),
    "GocamTransform": _gocam,
    "ChemblTransform": _chembl,
}


def transform(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    sources: list[str] | None = None,
) -> dict[str, tuple[DataFrame, DataFrame]]:
    """Run the named transforms (default: all) over
    `<input_dir>/<source>/…` and write `<output_dir>/<source>/` KGX TSV
    trees (reference transform.py:41-66). Returns the frames too."""
    out: dict[str, tuple[DataFrame, DataFrame]] = {}
    for source in sources or list(DATA_SOURCES):
        if source not in DATA_SOURCES:
            raise ValueError(f"unknown source: {source}")
        nodes, edges = DATA_SOURCES[source](spark, f"{input_dir}/{source}")
        write_kgx(nodes, edges, f"{output_dir}/{source}")
        out[source] = (nodes, edges)
    return out
