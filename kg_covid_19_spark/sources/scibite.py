"""SciBite CORD-19 transform — the reference's richest source, as a
Spark plan.

Reference: kg_covid_19/transform_utils/scibite_cord/scibite_cord.py.
Two passes share one ``seen`` set (scibite_cord.py:38, run():82-101):

1. **Annotations** (parse_annotation_doc, :140-232): each publication
   JSON (3 zips of per-paper files) → one ``biolink:Publication`` node
   (CORD:<paper_id>, whitespace-scrubbed title, :155-157+C5), the
   per-doc union of termite-hit term ids (:152-171), one
   ``biolink:mentions`` edge per (paper, term) (:220-232), and a term
   node gated on ``t not in seen`` where ``seen`` accumulates *curies*
   (:203-218) — so the gate only deduplicates terms whose raw form IS
   already a CURIE; IRI/country terms re-emit per document. Mirrored
   exactly: curie==t terms → global dropDuplicates, others → one node
   per (doc, term).
2. **Co-occurrence** (parse_cooccurrence_record, :253-340): per
   sentence row, paper node on first sight (id not seen in pass 1,
   ``.xml`` stripped, :268-284), and for each ``|``-split term the node
   is re-emitted per (row, term) while the ``correlated_with`` edge is
   deduplicated on the (curie, paper) pair (:290-340; note the edge
   write is NESTED inside the node's seen-gate, so curie-form terms
   emit at most one cooc edge ever).

Faithfully mirrored quirks:

* term-node ``name`` is always ``""`` for non-country terms — the
  reference assigns a 1-tuple (``name = (map[t] ...,)``,
  scibite_cord.py:202,306) then writes ``""`` because the tuple fails
  ``isinstance(name, str)`` (:210).
* a doc without ``metadata`` writes the literal string ``"None"`` as
  its title (f-string over ``title = None``, :154,180).
* 2-letter terms are country codes: mapped through
  wikidata_country_codes.tsv to a WD entity + real name, category
  ``biolink:NamedThing`` (:189-199).

Contraction (contract_uri, :360-393): the reference tries
``prefixcommons.contract_uri`` default cmaps then CUSTOM_CMAP
(:19-25). prefixcommons is not in this environment, so the effective
table for every IRI family present in CORD data is pinned statically:
the generic OBO PURL rule plus the custom prefixes. ``http://purl.
uniprot.org/uniprot/`` (prefixcommons' registry form) is included —
if the installed prefixcommons build lacked it the reference would
keep the raw IRI; we contract (14 of ~2300 fixture terms).
gene-symbol IRIs resolve through the NCBI gene_info symbol map
(NCBIGene:<id>) with an ``HGNC:<symbol>`` fallback (:371-377+J4).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import CURIE_RE, scrub_whitespace

SOURCE = "SciBite-CORD-19"
COOC_SOURCE = f"{SOURCE} co-occurrences"

NODE_COLS = ["id", "name", "category", "description", "provided_by"]
EDGE_COLS = ["subject", "predicate", "object", "relation", "provided_by", "type"]

GENENAMES_IRI = "http://www.genenames.org/cgi-bin/gene_symbol_report?match="

# static (prefix → IRI) contraction table: CUSTOM_CMAP
# (scibite_cord.py:19-25) + the prefixcommons registry forms met in
# CORD data; longest match wins. The OBO PURL family is handled by a
# generic regex rule (any http://purl.obolibrary.org/obo/<PFX>_<id>).
CMAP = {
    "CHEMBL.COMPOUND": "https://www.ebi.ac.uk/chembl/compound_report_card/",
    "MESH": "https://id.nlm.nih.gov/mesh/",
    "UniProtKB": "https://www.uniprot.org/uniprot/",
    "UniProtKB#purl": "http://purl.uniprot.org/uniprot/",  # registry form
    "WD": "http://www.wikidata.org/entity/",
}
_OBO_RE = r"^https?://purl\.obolibrary\.org/obo/([A-Za-z0-9]+)_(.+)$"

DOC_SCHEMA = (
    "subset string, filename string, paper_id string, title string, "
    "has_metadata boolean, terms array<string>"
)


def _doc_terms(doc: dict) -> list[str]:
    """Per-doc term-id union over metadata/abstract/body sections
    (scibite_cord.py:152-171), sorted for determinism."""
    terms: set[str] = set()
    sections = []
    if "metadata" in doc:
        sections.append(doc["metadata"])
    sections.extend(doc.get("abstract", []))
    sections.extend(doc.get("body_text", []))
    for sec in sections:
        for hits in sec.get("termite_hits", {}).values():
            for hit in hits:
                terms.add(hit["id"])
    return sorted(terms)


def zip_json_docs(spark: SparkSession, zip_paths: list[str]) -> DataFrame:
    """Scan zips of per-publication JSON files → one row per document.

    binaryFile scan (one task per zip) + Arrow-batched mapInPandas —
    the 10^12-doc shape would hold the same columns in an Iceberg
    table; this scan exists for reference-fixture parity. Dotfiles are
    skipped (scibite_cord.py:134-136).
    """
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                subset = os.path.basename(path).rsplit(".", 1)[0]
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        base = name.rsplit("/", 1)[-1]
                        if not base or base.startswith(".") or not (
                            name.endswith(".json")
                        ):
                            continue
                        doc = json.loads(zf.read(name))
                        md = doc.get("metadata")
                        out.append(
                            {
                                "subset": subset,
                                "filename": base,
                                "paper_id": doc["paper_id"],
                                "title": (
                                    md.get("title", "") if md is not None
                                    else None
                                ),
                                "has_metadata": md is not None,
                                "terms": _doc_terms(doc),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "subset", "filename", "paper_id", "title",
                    "has_metadata", "terms",
                ],
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(zip_paths)
        .select("path", "content")
        .mapInPandas(parse, DOC_SCHEMA)
    )


def gene_symbol_map(spark: SparkSession, gene_info_gz: str,
                    species_id: tuple[str, ...] = ("9606",)) -> DataFrame:
    """NCBI gene_info: symbol → first-wins NCBI gene id
    (scibite_cord.py:420-452; first-wins A4 via min_by on file order)."""
    df = (
        spark.read.option("sep", "\t").csv(gene_info_gz)
        .withColumn("_lid", F.monotonically_increasing_id())
        .filter(F.col("_c0").isin(*species_id))
    )
    return (
        df.groupBy(F.col("_c2").alias("symbol"))
        .agg(F.min_by(F.col("_c1"), F.col("_lid")).alias("ncbi"))
    )


def country_code_map(spark: SparkSession, tsv: str) -> DataFrame:
    """wikidata_country_codes.tsv → (code, item IRI, name)
    (scibite_cord.py:454-465)."""
    return (
        spark.read.option("sep", "\t").option("header", True).csv(tsv)
        .select("code", "item", F.col("name").alias("country_name"))
    )


def contract_plain(iri: Column) -> Column:
    """contract_uri minus the gene-symbol branch (scibite_cord.py:378-393):
    IRI → longest-prefix CURIE (raw IRI on no match); CURIE passthrough;
    else ':'+term."""
    obo_pfx = F.regexp_extract(iri, _OBO_RE, 1)
    hit = F.when(
        obo_pfx != "",
        F.concat(obo_pfx, F.lit(":"), F.regexp_extract(iri, _OBO_RE, 2)),
    )
    for prefix, base in sorted(CMAP.items(), key=lambda kv: -len(kv[1])):
        curie_pfx = prefix.split("#", 1)[0]
        hit = F.coalesce(
            hit,
            F.when(
                iri.startswith(base),
                F.concat(
                    F.lit(curie_pfx + ":"),
                    F.substring(iri, len(base) + 1, 2**18),
                ),
            ),
        )
    return (
        F.when(iri.rlike("^http[s]?://"), F.coalesce(hit, iri))
        .when(iri.rlike(CURIE_RE), iri)
        .otherwise(F.concat(F.lit(":"), iri))
    )


def _with_term_fields(
    exploded: DataFrame, genes: DataFrame, countries: DataFrame
) -> DataFrame:
    """term → (curie, term_name, category, is_curie_form) via broadcast
    joins (J4/J5) + the contraction chain (C1/C2)."""
    t = F.col("term")
    is_gene_iri = t.contains(GENENAMES_IRI)
    symbol = F.substring_index(t, "=", -1)
    is_country = F.length(t) == 2

    out = (
        exploded
        .withColumn("_symbol", F.when(is_gene_iri, symbol))
        .join(
            F.broadcast(genes.withColumnRenamed("symbol", "_symbol")),
            "_symbol", "left",
        )
        .withColumn("_code", F.when(is_country, t))
        .join(
            F.broadcast(countries.withColumnRenamed("code", "_code")),
            "_code", "left",
        )
    )
    gene_curie = F.when(
        out["ncbi"].isNotNull(), F.concat(F.lit("NCBIGene:"), out["ncbi"])
    ).otherwise(F.concat(F.lit("HGNC:"), symbol))
    country_curie = F.when(
        out["item"].isNotNull(), contract_plain(out["item"])
    ).otherwise(contract_plain(t))
    curie = (
        F.when(is_gene_iri, gene_curie)
        .when(is_country, country_curie)
        .otherwise(contract_plain(t))
    )
    return (
        out.withColumn("curie", curie)
        # non-country names are always "" — the reference's 1-tuple bug
        .withColumn(
            "term_name",
            F.when(is_country, F.coalesce(out["country_name"], F.lit("")))
            .otherwise(F.lit("")),
        )
        .withColumn(
            "category",
            F.when(is_country, F.lit("biolink:NamedThing"))
            .otherwise(F.lit("biolink:OntologyClass")),
        )
        .withColumn("is_curie_form", F.col("curie") == t)
        .drop("_symbol", "ncbi", "_code", "item", "country_name")
    )


def scibite_annotations(
    spark: SparkSession,
    zip_paths: list[str],
    gene_info_gz: str,
    country_tsv: str,
) -> tuple[DataFrame, DataFrame]:
    """Annotation pass → (nodes, edges)."""
    docs = zip_json_docs(spark, zip_paths)
    genes = gene_symbol_map(spark, gene_info_gz)
    countries = country_code_map(spark, country_tsv)

    lit = F.lit
    paper_nodes = docs.select(
        F.concat(lit("CORD:"), F.col("paper_id")).alias("id"),
        F.when(
            F.col("has_metadata"), scrub_whitespace(F.col("title"))
        ).otherwise(lit("None")).alias("name"),
        lit("biolink:Publication").alias("category"),
        lit("").alias("description"),
        lit(SOURCE).alias("provided_by"),
    )

    terms = _with_term_fields(
        docs.select("paper_id", F.explode("terms").alias("term")),
        genes, countries,
    ).cache()

    term_node = lambda df: df.select(  # noqa: E731
        F.col("curie").alias("id"),
        F.col("term_name").alias("name"),
        "category",
        lit("").alias("description"),
        lit(SOURCE).alias("provided_by"),
    )
    # seen-gate checks the RAW term but records the CURIE
    # (scibite_cord.py:203-218) ⇒ only curie-form terms dedup globally
    nodes = (
        paper_nodes
        .unionByName(term_node(terms.filter("is_curie_form")
                               .dropDuplicates(["term"])))
        .unionByName(term_node(terms.filter(~F.col("is_curie_form"))))
    )
    edges = terms.select(
        F.concat(lit("CORD:"), F.col("paper_id")).alias("subject"),
        lit("biolink:mentions").alias("predicate"),
        F.col("curie").alias("object"),
        lit("SIO:000255").alias("relation"),
        lit(SOURCE).alias("provided_by"),
        lit("biolink:Association").alias("type"),
    )
    return nodes.select(*NODE_COLS), edges.select(*EDGE_COLS)


def read_cooc_table(spark: SparkSession, scc_zip: str) -> DataFrame:
    """cv19_scc.tsv out of its zip → DataFrame (S4 zip pattern)."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    name = next(
                        n for n in zf.namelist() if n.endswith(".tsv")
                    )
                    tbl = pd.read_csv(
                        io.BytesIO(zf.read(name)), sep="\t",
                        encoding="utf-8", dtype=str,
                    )
                tbl["_row"] = range(len(tbl))
                yield tbl[
                    ["_row", "document_id", "sentence_id", "entity_uris"]
                ]

    return (
        spark.read.format("binaryFile").load(scc_zip).select("content")
        .mapInPandas(
            parse,
            "_row long, document_id string, sentence_id string, "
            "entity_uris string",
        )
    )


def scibite_cooccurrence(
    spark: SparkSession,
    scc_zip: str,
    gene_info_gz: str,
    country_tsv: str,
    annotation_paper_ids: DataFrame | None = None,
    annotation_curie_terms: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Co-occurrence pass → (nodes, edges); the two optional frames are
    pass 1's contributions to the shared ``seen`` set (paper ids and
    curie-form terms)."""
    genes = gene_symbol_map(spark, gene_info_gz)
    countries = country_code_map(spark, country_tsv)
    lit = F.lit

    rows = (
        read_cooc_table(spark, scc_zip)
        .filter(F.col("entity_uris").isNotNull())
        .withColumn(
            "paper_id",
            F.regexp_replace(F.col("document_id"), r"\.xml$", ""),
        )
    )

    papers = rows.groupBy("paper_id").agg(F.min("_row").alias("_row"))
    if annotation_paper_ids is not None:
        papers = papers.join(
            F.broadcast(annotation_paper_ids), "paper_id", "left_anti"
        )
    paper_nodes = papers.select(
        F.concat(lit("CORD:"), F.col("paper_id")).alias("id"),
        lit("").alias("name"),
        lit("biolink:Publication").alias("category"),
        lit("").alias("description"),
        lit(COOC_SOURCE).alias("provided_by"),
    )

    terms = _with_term_fields(
        rows.select(
            "_row", "paper_id",
            F.explode(
                F.array_distinct(F.split("entity_uris", r"\|"))
            ).alias("term"),
        ),
        genes, countries,
    ).withColumn(
        "paper_curie", F.concat(lit("CORD:"), F.col("paper_id"))
    ).cache()

    neq = terms.filter(~F.col("is_curie_form"))
    eq = terms.filter("is_curie_form")
    if annotation_curie_terms is not None:
        eq = eq.join(F.broadcast(annotation_curie_terms), "term", "left_anti")
    eq_first = eq.dropDuplicates(["term"])

    term_node = lambda df: df.select(  # noqa: E731
        F.col("curie").alias("id"),
        F.col("term_name").alias("name"),
        "category",
        lit("").alias("description"),
        lit(COOC_SOURCE).alias("provided_by"),
    )
    # neq terms: node per (row, term); eq terms: node only on global
    # first occurrence not already seen in pass 1 (scibite_cord.py:290-318)
    nodes = paper_nodes.unionByName(term_node(neq)).unionByName(
        term_node(eq_first)
    )

    edge = lambda df: df.select(  # noqa: E731
        F.col("curie").alias("subject"),
        lit("biolink:correlated_with").alias("predicate"),
        F.col("paper_curie").alias("object"),
        lit("RO:0002610").alias("relation"),
        lit(COOC_SOURCE).alias("provided_by"),
        lit("biolink:Association").alias("type"),
    )
    # the edge write is nested inside the node's seen-gate
    # (scibite_cord.py:319-340): neq ⇒ every occurrence reaches the
    # pair-dedup; eq ⇒ only the node-emitting first occurrence does
    edges = edge(
        neq.dropDuplicates(["curie", "paper_curie"])
    ).unionByName(edge(eq_first))
    return nodes.select(*NODE_COLS), edges.select(*EDGE_COLS)


def scibite_transform(
    spark: SparkSession, input_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Full two-pass transform on a reference-layout input dir →
    (anno_nodes, anno_edges, cooc_nodes, cooc_edges)."""
    zips = [
        f"{input_dir}/pmc_json.zip",
        f"{input_dir}/pdf_json_part_1.zip",
        f"{input_dir}/pdf_json_part_2.zip",
    ]
    gene_info = f"{input_dir}/gene_info.gz"
    countries = f"{input_dir}/wikidata_country_codes.tsv"
    anno_nodes, anno_edges = scibite_annotations(
        spark, zips, gene_info, countries
    )
    docs = zip_json_docs(spark, zips)
    genes = gene_symbol_map(spark, gene_info)
    cmap = country_code_map(spark, countries)
    pass1_terms = _with_term_fields(
        docs.select("paper_id", F.explode("terms").alias("term")),
        genes, cmap,
    )
    cooc_nodes, cooc_edges = scibite_cooccurrence(
        spark,
        f"{input_dir}/cv19_scc_1_2.zip",
        gene_info,
        countries,
        annotation_paper_ids=docs.select("paper_id").distinct(),
        annotation_curie_terms=(
            pass1_terms.filter("is_curie_form").select("term").distinct()
        ),
    )
    return anno_nodes, anno_edges, cooc_nodes, cooc_edges
