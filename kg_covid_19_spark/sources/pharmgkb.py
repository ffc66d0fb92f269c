"""PharmGKB drug→gene transform as a Spark DataFrame plan.

Reference: kg_covid_19/transform_utils/pharmgkb/pharmgkb.py —
Gene–Chemical rows of relationships.tsv become one interacts_with edge
plus per-line gene/drug nodes (pharmgkb.py:144-190); gene ids remap to
UniProtKB via the genes.tsv xref map (pharmgkb.py:308-317), drug ids to
the highest-priority xref CHEBI > CHEMBL > DRUGBANK > PUBCHEM
(pharmgkb.py:191-253), and drug *nodes* (not edges) additionally pass
through the SSSOM normalization map (pharmgkb.py:335-345, the
"two-pass scan" — pass 1 collects drug curies, pass 2 emits; here the
rescan is simply reusing the same DataFrame, SURVEY.md §4).

Faithfully mirrored quirks (observable behavior, goldens in
tests/test_pharmgkb.py:33-84):

* ``make_id_mapping_file`` splits each ``"k:v"`` xref on the FIRST
  colon (pharmgkb.py:289-295) — so ``ChEBI:CHEBI:1391`` parses as
  ``parsed_ids['ChEBI'] = 'CHEBI:1391'`` — while
  ``make_preferred_drug_id`` re-parses the same string with
  ``rpartition(':')`` (LAST colon, pharmgkb.py:236-240), yielding key
  ``ChEBI:CHEBI`` → ``1391``. Both parses exist here.
* duplicate xref keys: dict assignment ⇒ last occurrence wins — we use
  ``element_at(filter(...), -1)``.
* the ``PubChem Compound:`` priority key carries a trailing colon the
  rpartition keys never produce, so PUBCHEM is unreachable — kept
  verbatim for parity.
* nodes are emitted once per relationship line with NO dedup (the one
  reference transform without a seen-set); the engine's merge stage
  (operators/merge.py) is where dedup happens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PHARMGKB_NODE_COLS = ["id", "name", "category", "provided_by"]
PHARMGKB_EDGE_COLS = [
    "subject", "predicate", "object", "relation", "provided_by", "type",
    "evidence",
]

SOURCE = "pharmgkb"
GENE_CATEGORY = "biolink:Gene"
DRUG_CATEGORY = "biolink:Drug"
EDGE_PREDICATE = "biolink:interacts_with"
EDGE_RELATION = "RO:0002436"

# desc-priority: raw-string key (as produced by rpartition on the last
# colon) → canonical CURIE prefix (pharmgkb.py:211-216)
PREFERRED_IDS = [
    ("ChEBI:CHEBI", "CHEBI"),
    ("CHEMBL", "CHEMBL"),
    ("DrugBank", "DRUGBANK"),
    ("PubChem Compound:", "PUBCHEM"),  # unreachable, as in the reference
]

ACCESSION_COL = "PharmGKB Accession Id"
XREF_COL = "Cross-references"


def _xref_items(xrefs: Column) -> Column:
    """split on ',', strip surrounding quotes (pharmgkb.py:234-238,293)."""
    return F.transform(
        F.split(xrefs, ","),
        lambda x: F.regexp_replace(x, '^"|"$', ""),
    )


def _last_wins(entries: Column, key: str) -> Column:
    """value of the last entry whose key == `key`, else null."""
    hits = F.filter(entries, lambda e: e["k"] == F.lit(key))
    return F.when(F.size(hits) > 0, F.element_at(hits, -1)["v"])


def read_id_map(spark: SparkSession, map_file: str) -> DataFrame:
    """genes.tsv / drugs.tsv → one row per PharmGKB id with both xref
    parses (pharmgkb.py:255-307): `parsed_ids` splits k:v on the FIRST
    colon; `xref_pairs` on the LAST (rpartition semantics)."""
    raw = (
        spark.read.option("header", True).option("sep", "\t")
        .option("quote", "")  # reference strips quotes itself
        .csv(map_file)
        .select(
            F.col(ACCESSION_COL).alias("pharmgkb_id"),
            F.col(XREF_COL).alias("xrefs"),
        )
    )
    items = F.filter(_xref_items(F.col("xrefs")), lambda x: x != F.lit(""))
    first_split = F.transform(
        items,
        lambda x: F.struct(
            F.substring_index(x, ":", 1).alias("k"),
            F.substring(x, F.instr(x, ":") + 1, F.length(x)).alias("v"),
        ),
    )
    # rpartition(':'): key = all before last colon, value = after it.
    # Items with no colon get partitioned to key='' (len<3 guard in the
    # reference skips nothing in practice; rpartition always yields 3).
    last_split = F.transform(
        items,
        lambda x: F.struct(
            F.regexp_replace(x, ":[^:]*$", "").alias("k"),
            F.substring_index(x, ":", -1).alias("v"),
        ),
    )
    return raw.select(
        "pharmgkb_id",
        F.coalesce(first_split, F.array()).alias("parsed_ids"),
        F.coalesce(last_split, F.array()).alias("xref_pairs"),
    )


def preferred_drug_id(pharmgkb_id: Column, xref_pairs: Column) -> Column:
    """CHEBI > CHEMBL > DRUGBANK > PUBCHEM, else pharmgkb.drug:<id>
    (pharmgkb.py:191-253). xref_pairs null ⇒ id not in the map."""
    picks = [
        F.when(
            _last_wins(xref_pairs, raw_key).isNotNull(),
            F.concat(F.lit(prefix + ":"), _last_wins(xref_pairs, raw_key)),
        )
        for raw_key, prefix in PREFERRED_IDS
    ]
    return F.coalesce(*picks, F.concat(F.lit("pharmgkb.drug:"), pharmgkb_id))


def uniprot_gene_id(pharmgkb_id: Column, parsed_ids: Column) -> Column:
    """UniProtKB:<acc> via parsed_ids, else PHARMGKB:<id>
    (pharmgkb.py:308-317)."""
    acc = F.when(
        parsed_ids.isNotNull(), _last_wins(parsed_ids, "UniProtKB")
    )
    return F.coalesce(
        F.concat(F.lit("UniProtKB:"), acc),
        F.concat(F.lit("PHARMGKB:"), pharmgkb_id),
    )


def pharmgkb_transform(
    spark: SparkSession,
    relationships_file: str,
    gene_map_file: str,
    drug_map_file: str,
    sssom_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """relationships.tsv + id maps → (nodes, edges) DataFrames.

    Joins are broadcast (the id maps are the reference's in-memory
    dicts); the SSSOM normalization is the engine's J6 left-join +
    coalesce, applied only to drug *node* ids with prefix in
    {pharmgkb.drug, DRUGBANK, CHEBI} (pharmgkb.py:335-345).
    """
    rel = (
        spark.read.option("header", True).option("sep", "\t").csv(
            relationships_file
        )
        .filter(
            F.array_sort(F.array("Entity1_type", "Entity2_type"))
            == F.array(F.lit("Chemical"), F.lit("Gene"))
        )
    )
    gene_first = F.col("Entity1_type") == "Gene"

    def _side(col_suffix: str, gene: bool) -> Column:
        a, b = (1, 2) if gene else (2, 1)
        return F.when(gene_first, F.col(f"Entity{a}_{col_suffix}")).otherwise(
            F.col(f"Entity{b}_{col_suffix}")
        )

    rel = rel.select(
        F.col("Evidence").alias("evidence"),
        _side("id", gene=True).alias("gene_id"),
        _side("id", gene=False).alias("drug_id"),
        _side("name", gene=True).alias("gene_name"),
        _side("name", gene=False).alias("drug_name"),
    )

    gene_map = read_id_map(spark, gene_map_file).select(
        F.col("pharmgkb_id").alias("gene_id"), "parsed_ids"
    )
    drug_map = read_id_map(spark, drug_map_file).select(
        F.col("pharmgkb_id").alias("drug_id"), "xref_pairs"
    )
    resolved = (
        rel.join(F.broadcast(gene_map), "gene_id", "left")
        .join(F.broadcast(drug_map), "drug_id", "left")
        .select(
            "evidence", "gene_name", "drug_name",
            uniprot_gene_id(F.col("gene_id"), F.col("parsed_ids")).alias(
                "gene_curie"
            ),
            preferred_drug_id(F.col("drug_id"), F.col("xref_pairs")).alias(
                "drug_curie"
            ),
        )
    )

    # SSSOM pass (node ids only, prefix-gated) — identity when no map
    drug_node_id = F.col("drug_curie")
    if sssom_df is not None:
        resolved = resolved.join(
            F.broadcast(
                sssom_df.select(
                    F.col("subject_id").alias("drug_curie"),
                    F.col("object_id").alias("_norm"),
                )
            ),
            "drug_curie",
            "left",
        )
        drug_node_id = F.when(
            F.split(F.col("drug_curie"), ":")[0].isin(
                "pharmgkb.drug", "DRUGBANK", "CHEBI"
            ),
            F.coalesce(F.col("_norm"), F.col("drug_curie")),
        ).otherwise(F.col("drug_curie"))

    lit = F.lit
    gene_nodes = resolved.select(
        F.col("gene_curie").alias("id"),
        F.col("gene_name").alias("name"),
        lit(GENE_CATEGORY).alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    drug_nodes = resolved.select(
        drug_node_id.alias("id"),
        F.col("drug_name").alias("name"),
        lit(DRUG_CATEGORY).alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    nodes = gene_nodes.unionByName(drug_nodes).select(*PHARMGKB_NODE_COLS)

    edges = resolved.select(
        F.col("drug_curie").alias("subject"),
        lit(EDGE_PREDICATE).alias("predicate"),
        F.col("gene_curie").alias("object"),
        lit(EDGE_RELATION).alias("relation"),
        lit(SOURCE).alias("provided_by"),
        lit("biolink:Association").alias("type"),
        F.coalesce(F.col("evidence"), lit("")).alias("evidence"),
    ).select(*PHARMGKB_EDGE_COLS)

    return nodes, edges
