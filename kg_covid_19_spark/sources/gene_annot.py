"""SARS-CoV-2 gene-annotation source — GPI/GPA flat files (SURVEY.md S10).

Reference: kg_covid_19/transform_utils/sars_cov_2_gene_annot/
sars_cov_2_gene_annot.py:69-307 — a node per GPI 1.2 record, an edge per
GPA 1.1 record, plus bare nodes (category guessed from the CURIE prefix)
for GPA endpoints that no GPI record declared.

Quirks reproduced for parity:
* the reference's GPA iterator names field 10 "Annotation Extension" but
  the edge builder fetches "Annotation_Extension" — so that column is
  always '' (sars_cov_2_gene_annot.py:137-155 vs 289);
* DB_Object_Synonym and DB_Xref pass through unsplit (split→'|'.join is
  the identity on the raw string);
* Interacting_taxon_ID is prefixed NCBITaxon: only when non-empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import guess_bl_category

SOURCE = "sars_cov_2_gene_annot"

NODE_COLS = ["id", "name", "category", "full_name", "synonym", "in_taxon",
             "xrefs", "provided_by"]
EDGE_COLS = ["subject", "predicate", "object", "relation", "provided_by",
             "type", "DB_References", "ECO_code", "With",
             "Interacting_taxon_ID", "Date", "Assigned_by",
             "Annotation_Extension", "Annotation_Properties"]

QUALIFIER_RO = {
    "enables": "RO:0002327",
    "involved_in": "RO:0002331",
    "part_of": "BFO:0000050",
}


def _records(spark: SparkSession, path: str) -> DataFrame:
    """Comment-skipping tab-split record frame (F7)."""
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("!"))
        .withColumn("c", F.split(F.col("value"), "\t"))
        .filter(F.size("c") > 1)
    )


def _f(i: int) -> Column:
    # try_element_at: GPI/GPA rows legitimately vary in trailing fields
    return F.coalesce(F.try_element_at("c", F.lit(i + 1)), F.lit(""))


def _first_pipe(i: int) -> Column:
    return F.coalesce(F.split(_f(i), r"\|").getItem(0), F.lit(""))


def gpi_nodes(spark: SparkSession, gpi_path: str) -> DataFrame:
    return _records(spark, gpi_path).select(
        F.concat(_f(0), F.lit(":"), _f(1)).alias("id"),
        _first_pipe(2).alias("name"),
        F.lit("biolink:Protein").alias("category"),
        _first_pipe(3).alias("full_name"),
        _f(4).alias("synonym"),
        F.concat(F.lit("NCBITaxon:"), F.split(_f(6), ":").getItem(1))
        .alias("in_taxon"),
        _f(8).alias("xrefs"),
        F.lit(SOURCE).alias("provided_by"),
    )


def gpa_edges(spark: SparkSession, gpa_path: str) -> DataFrame:
    qualifier = _first_pipe(2)
    relation: Column = F.lit("")
    for q, ro in QUALIFIER_RO.items():
        relation = F.when(qualifier == q, F.lit(ro)).otherwise(relation)
    taxon = F.when(
        _f(7) != "", F.concat(F.lit("NCBITaxon:"), _f(7))
    ).otherwise(F.lit(""))
    return _records(spark, gpa_path).select(
        F.concat(_f(0), F.lit(":"), _f(1)).alias("subject"),
        F.concat(F.lit("biolink:"), qualifier).alias("predicate"),
        _f(3).alias("object"),
        relation.alias("relation"),
        F.lit(SOURCE).alias("provided_by"),
        F.lit("biolink:Association").alias("type"),
        _first_pipe(4).alias("DB_References"),
        _f(5).alias("ECO_code"),
        _first_pipe(6).alias("With"),
        taxon.alias("Interacting_taxon_ID"),
        _f(8).alias("Date"),
        _f(9).alias("Assigned_by"),
        F.lit("").alias("Annotation_Extension"),  # reference key-mismatch quirk
        _f(11).alias("Annotation_Properties"),
    )


def gene_annot_transform(spark: SparkSession, gpi_path: str, gpa_path: str,
                         ) -> tuple[DataFrame, DataFrame]:
    nodes = gpi_nodes(spark, gpi_path)
    edges = gpa_edges(spark, gpa_path)
    endpoints = (
        edges.select(F.col("subject").alias("id"))
        .unionAll(edges.select(F.col("object").alias("id")))
        .distinct()
    )
    bare = (
        endpoints.join(nodes.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit("").alias("name"),
            guess_bl_category(F.col("id")).alias("category"),
            F.lit("").alias("full_name"),
            F.lit("").alias("synonym"),
            F.lit("").alias("in_taxon"),
            F.lit("").alias("xrefs"),
            F.lit(SOURCE).alias("provided_by"),
        )
    )
    return nodes.unionByName(bare).select(*NODE_COLS), edges.select(*EDGE_COLS)
