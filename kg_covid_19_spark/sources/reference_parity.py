"""Reference-parity transforms: the reference's per-source ETL classes
re-expressed as Spark DataFrame plans, runnable on the reference's own
pytest fixtures so emitted (subject, predicate, object) triples can be
scored P/R against the reference's golden expectations (north_rule:
P/R ≥ 0.95 vs reference triples).

Covered sources (the two with the richest golden assertions):

* STRING protein-protein interactions
  (kg_covid_19/transform_utils/string_ppi/string_ppi.py:40-261;
  goldens tests/test_string.py:72-140 — nodes (10,6), edges (9,20),
  isoform-collapsed UniProt xref)
* DrugCentral drug→target interactions
  (kg_covid_19/transform_utils/drug_central/drug_central.py:38-146;
  goldens tests/test_drug_central.py:65-137 — nodes (23,5), edges (21,7),
  no duplicate nodes)

First-wins note: the reference's seen-sets depend on file order. These
fixtures are single gzip files (one Spark split), so ``_lid`` =
monotonically_increasing_id reproduces file order exactly; at scale the
engine replaces file order with explicit priority ranks (SURVEY.md §7.4
risk 1) — the *triple set* is order-independent either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curie import collapse_uniprot_curie

def _empty() -> Column:
    # F.lit needs an active SparkContext — defer creation to call time
    return F.lit("")


def _with_lid(df: DataFrame) -> DataFrame:
    return df.withColumn("_lid", F.monotonically_increasing_id())


def _blank(c: Column) -> Column:
    return F.coalesce(c, _empty())


# ---------------------------------------------------------------------------
# STRING
# ---------------------------------------------------------------------------

STRING_CHANNELS = [
    "neighborhood", "neighborhood_transferred", "fusion", "cooccurence",
    "homology", "coexpression", "coexpression_transferred", "experiments",
    "experiments_transferred", "database", "database_transferred",
    "textmining", "textmining_transferred",
]
STRING_NODE_COLS = ["id", "name", "category", "description", "xrefs", "provided_by"]
STRING_EDGE_COLS = (
    ["subject", "predicate", "object", "relation", "provided_by", "type",
     "combined_score"] + STRING_CHANNELS
)


def string_transform(spark: SparkSession, input_dir: str,
                     data_file: str = "9606.protein.links.full.v11.5.txt.gz",
                     species: str = "9606") -> tuple[DataFrame, DataFrame]:
    """STRING PPI → (nodes, edges), reference semantics (string_ppi.py:135-261).

    Dictionary loads are the reference's three startup dicts as broadcast
    frames: gene2ensembl protein→gene / gene→ncbi (first-wins by file line,
    string_ppi.py:61-96), gene_info ncbi→(symbol, description)
    (string_ppi.py:98-132), idmapping name→UniProt accession (last-wins,
    utils/transform_utils.py:120-138).
    """
    strip_tax = lambda c: F.substring_index(c, ".", -1)  # noqa: E731

    inter = _with_lid(
        spark.read.option("header", True).option("sep", " ")
        .csv(f"{input_dir}/{data_file}")
    )

    g2e = (
        _with_lid(spark.read.option("sep", "\t").csv(f"{input_dir}/gene2ensembl.gz"))
        .filter(F.col("_c0") == species)
        .select(
            F.col("_c1").alias("ncbi"),
            F.col("_c2").alias("ens_gene"),
            F.split(F.col("_c6"), r"\.").getItem(0).alias("protein"),
            "_lid",
        )
    )
    protein_gene = g2e.groupBy("protein").agg(
        F.min_by("ens_gene", "_lid").alias("ens_gene")
    )
    ensembl2ncbi = g2e.groupBy("ens_gene").agg(F.min_by("ncbi", "_lid").alias("ncbi"))

    gene_info = (
        _with_lid(spark.read.option("sep", "\t").csv(f"{input_dir}/gene_info.gz"))
        .filter(F.col("_c0") == species)
        .groupBy(F.col("_c1").alias("ncbi"))
        .agg(
            F.min_by("_c2", "_lid").alias("symbol"),
            F.min_by("_c8", "_lid").alias("description"),
        )
    )

    idmap = (
        _with_lid(spark.read.option("sep", "\t")
                  .csv(f"{input_dir}/HUMAN_9606_idmapping.dat.gz"))
        .groupBy(F.col("_c2").alias("name"))
        .agg(F.max_by("_c0", "_lid").alias("uniprot"))  # dict overwrite = last wins
    )

    # endpoint occurrences in file order: (occurrence key, protein)
    occ = inter.select(
        "_lid",
        F.posexplode(
            F.array(strip_tax(F.col("protein1")), strip_tax(F.col("protein2")))
        ).alias("pos", "protein"),
    ).withColumn("okey", F.col("_lid") * 2 + F.col("pos"))

    # protein nodes: one per distinct protein, UniProt xref left-joined and
    # isoform-collapsed (transform_utils.py:205-218)
    proteins = occ.groupBy("protein").agg(F.min("okey").alias("first_okey"))
    protein_nodes = (
        proteins.join(F.broadcast(idmap), proteins.protein == idmap.name, "left")
        .select(
            F.concat(F.lit("ENSEMBL:"), "protein").alias("id"),
            _empty().alias("name"),
            F.lit("biolink:Protein").alias("category"),
            _empty().alias("description"),
            _blank(
                collapse_uniprot_curie(F.concat(F.lit("UniProtKB:"), "uniprot"))
            ).alias("xrefs"),
            F.lit("STRING").alias("provided_by"),
        )
    )

    # gene nodes + has_gene_product edges: first protein occurrence whose
    # gene is unseen wins (string_ppi.py:185-217)
    gene_first = (
        occ.join(F.broadcast(protein_gene), "protein")
        .groupBy("ens_gene")
        .agg(F.min_by("protein", "okey").alias("protein"))
        .join(F.broadcast(ensembl2ncbi), "ens_gene")
        .join(F.broadcast(gene_info), "ncbi")
    )
    gene_nodes = gene_first.select(
        F.concat(F.lit("ENSEMBL:"), "ens_gene").alias("id"),
        F.col("symbol").alias("name"),
        F.lit("biolink:Gene").alias("category"),
        F.col("description"),
        F.concat(F.lit("NCBIGene:"), "ncbi").alias("xrefs"),
        F.lit("STRING").alias("provided_by"),
    )
    gene_edges = gene_first.select(
        F.concat(F.lit("ENSEMBL:"), "ens_gene").alias("subject"),
        F.lit("biolink:has_gene_product").alias("predicate"),
        F.concat(F.lit("ENSEMBL:"), "protein").alias("object"),
        F.lit("RO:0002205").alias("relation"),
        F.lit("NCBI").alias("provided_by"),
        _empty().alias("type"),
        *[_empty().alias(c) for c in ["combined_score"] + STRING_CHANNELS],
    )

    ppi_edges = inter.select(
        F.concat(F.lit("ENSEMBL:"), strip_tax(F.col("protein1"))).alias("subject"),
        F.lit("biolink:interacts_with").alias("predicate"),
        F.concat(F.lit("ENSEMBL:"), strip_tax(F.col("protein2"))).alias("object"),
        F.lit("RO:0002434").alias("relation"),
        F.lit("STRING").alias("provided_by"),
        F.lit("biolink:Association").alias("type"),
        _blank(F.col("combined_score")).alias("combined_score"),
        *[_blank(F.col(c)).alias(c) for c in STRING_CHANNELS],
    )

    nodes = gene_nodes.unionByName(protein_nodes).select(*STRING_NODE_COLS)
    edges = gene_edges.unionByName(ppi_edges).select(*STRING_EDGE_COLS)
    return nodes, edges


# ---------------------------------------------------------------------------
# DrugCentral
# ---------------------------------------------------------------------------

DC_NODE_COLS = ["id", "name", "category", "TDL", "provided_by"]
DC_EDGE_COLS = ["subject", "predicate", "object", "relation", "provided_by",
                "comment", "type"]


def drug_central_transform(spark: SparkSession, input_dir: str,
                           data_file: str = "drug.target.interaction_SNIPPET.tsv.gz",
                           species: str = "Homo sapiens",
                           ) -> tuple[DataFrame, DataFrame]:
    """DrugCentral → (nodes, edges), reference semantics
    (drug_central.py:38-146).

    Line filters: ORGANISM == species (F2); ACCESSION/GENE/TDL present and
    non-empty (F5 — get_item_by_priority raises on blank, skipping the
    line). The pipe-zip follows items_dict_to_protein_data_dict
    (drug_central.py:167-195): GENE length mismatch → all-blank genes; TDL
    length mismatch → TDL list cycled; per-line dedup keyed on accession,
    last occurrence wins.
    """
    raw = _with_lid(
        spark.read.option("header", True).option("sep", "\t").option("quote", '"')
        .csv(f"{input_dir}/{data_file}")
    )
    rows = raw.filter(
        (F.col("ORGANISM") == species)
        & F.col("ACCESSION").isNotNull() & (F.col("ACCESSION") != "")
        & F.col("GENE").isNotNull() & (F.col("GENE") != "")
        & F.col("TDL").isNotNull() & (F.col("TDL") != "")
    )

    acc = F.split("ACCESSION", r"\|")
    gene = F.split("GENE", r"\|")
    tdl = F.split("TDL", r"\|")
    n = F.size(acc)
    gene_fixed = F.when(F.size(gene) != n,
                        F.array_repeat(_empty(), n)).otherwise(gene)
    tdl_fixed = F.when(
        F.size(tdl) != n,
        F.slice(F.flatten(F.array_repeat(tdl, n)), 1, n),
    ).otherwise(tdl)

    exploded = rows.select(
        "_lid",
        F.concat(F.lit("DrugCentral:"), "STRUCT_ID").alias("drug_id"),
        F.col("DRUG_NAME").alias("drug_name"),
        _blank(F.col("ACT_COMMENT")).alias("comment"),
        F.posexplode(F.arrays_zip(acc.alias("acc"), gene_fixed.alias("gene"),
                                  tdl_fixed.alias("tdl"))).alias("pos", "z"),
    ).select(
        "_lid", "drug_id", "drug_name", "comment", "pos",
        F.col("z.acc").alias("acc"), F.col("z.gene").alias("gene"),
        F.col("z.tdl").alias("tdl"),
    )
    # per-line dedup on accession, last occurrence wins (dict overwrite)
    per_line = exploded.groupBy("_lid", "drug_id", "drug_name", "comment", "acc").agg(
        F.max_by("gene", "pos").alias("gene"), F.max_by("tdl", "pos").alias("tdl")
    )

    drug_nodes = (
        rows.select(
            F.concat(F.lit("DrugCentral:"), "STRUCT_ID").alias("id"),
            F.col("DRUG_NAME").alias("name"), "_lid",
        )
        .groupBy("id")
        .agg(F.min_by("name", "_lid").alias("name"))
        .select(
            "id", "name",
            F.lit("biolink:Drug").alias("category"),
            _empty().alias("TDL"),
            F.lit("drug_central").alias("provided_by"),
        )
    )

    protein_nodes = (
        per_line.withColumn("okey", F.col("_lid"))
        .groupBy(F.concat(F.lit("UniProtKB:"), "acc").alias("id"))
        .agg(
            F.min_by("gene", "okey").alias("name"),
            F.min_by("tdl", "okey").alias("TDL"),
        )
        .select(
            "id", "name",
            F.lit("biolink:Protein").alias("category"),
            "TDL",
            F.lit("drug_central").alias("provided_by"),
        )
    )

    edges = per_line.select(
        F.col("drug_id").alias("subject"),
        F.lit("biolink:molecularly_interacts_with").alias("predicate"),
        F.concat(F.lit("UniProtKB:"), "acc").alias("object"),
        F.lit("RO:0002436").alias("relation"),
        F.lit("drug_central").alias("provided_by"),
        "comment",
        F.lit("biolink:Association").alias("type"),
    )

    nodes = drug_nodes.unionByName(
        protein_nodes.select(*DC_NODE_COLS)
    ).select(*DC_NODE_COLS)
    return nodes, edges.select(*DC_EDGE_COLS)
