"""Zhou et al. virus-host protein transform (PDF table source, S7).

Reference: kg_covid_19/transform_utils/zhou_host_proteins/
zhou_transform.py — tabula extracts the Suppl-Fig-3 table from pages
5-7 of the paper's PDF (zhou_transform.py:81-85), the multi-page JSON
becomes row dicts with the first page's first row as the shared header
(utils/transform_utils.py:28-68), and each row emits a host-gene node,
a virus node, and one interacts_with edge keyed by a fixed
coronavirus→taxon table (zhou_transform.py:60-70, 96-137).

Split exactly like the reference splits it:

* **decode** — `read_pdf_tables` is the tabula call. The PDF
  libraries are not in this container, so it is a clearly-marked stub
  (NotImplementedError) mirroring `operators/multimodal.py`'s decode
  gating; the Spark-side plumbing takes any DataFrame with the table's
  four columns.
* **transform** — `zhou_transform(spark, rows_df)`: pure column
  algebra over those rows, including the reference's behavior of
  raising on an unknown coronavirus (implemented as a raise-on-collect
  guard column so the check stays distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE = "zhou_host_proteins"

ZHOU_NODE_COLS = ["id", "name", "category", "provided_by"]
ZHOU_EDGE_COLS = [
    "subject", "predicate", "object", "relation", "provided_by", "type",
    "publication",
]

# zhou_transform.py:63-70
CORONA_TAXON = {
    "IBV": 11120,
    "MHV": 502104,
    "HCoV-NL63": 277944,
    "HCoV-229E": 11137,
    "SARS": 227859,
    "MERS": 1335626,
}

TABLE_COLUMNS = ["Coronavirus", "Host Gene ID", "Host Protein", "PubMed ID"]


SIDECAR_FILE = "41421_2020_153_MOESM1_ESM.tables.json"

# tabula.io.read_pdf(output_format-ish) JSON: a top-level array of page
# objects, each {"data": [[{"text": ...} × cells] × rows]}
# (utils/transform_utils.py:28-68).
_SIDECAR_SCHEMA = (
    "array<struct<data: array<array<struct<text: string>>>>>"
)


def read_table_sidecar(spark: SparkSession, json_path: str) -> DataFrame:
    """Pre-extracted tabula-JSON sidecar → table rows.

    The PDF decode itself needs tabula (stubbed below); its raw JSON
    output is a plain file this reader parses with the reference's
    exact semantics (multi_page_table_to_list + get_header_items,
    utils/transform_utils.py:28-68): the header is the FIRST page's
    FIRST row, every other row of every page zips against it.

    Read as wholetext + from_json (not spark.read.json) so the page
    array stays one ordered value — element order is what defines
    "first page / first row". One task for a KB-sized sidecar; the
    exploded rows distribute from there.
    """
    pages = spark.read.text(json_path, wholetext=True).select(
        F.from_json("value", _SIDECAR_SCHEMA).alias("pages")
    )
    # F.get, not getItem: Spark 4 ANSI getItem throws on empty arrays,
    # so a malformed/empty sidecar should surface as a clear error here
    # rather than an INVALID_ARRAY_INDEX deep in the scan
    head = pages.select(
        F.get(F.get(F.col("pages"), 0)["data"], 0).alias("h")
    ).first()["h"]
    if not head:
        raise ValueError(f"sidecar has no header row: {json_path}")
    header = [r["text"] for r in head]
    rows = (
        pages.select(F.posexplode("pages").alias("pg", "page"))
        .select("pg", F.posexplode("page.data").alias("ri", "row"))
        .filter(~((F.col("pg") == 0) & (F.col("ri") == 0)))
        .select(F.transform("row", lambda c: c["text"]).alias("cells"))
    )
    # F.get (null on missing), not getItem (ANSI throw): real tabula
    # output has ragged rows, and the reference's zip(header, row)
    # truncates rather than crashes (transform_utils.py:50-52)
    return rows.select(
        *[F.get("cells", i).alias(h) for i, h in enumerate(header)]
    )


def read_pdf_tables(spark: SparkSession, pdf_path: str,
                    pages: tuple[int, ...] = (5, 6, 7)) -> DataFrame:
    """tabula.io.read_pdf equivalent (zhou_transform.py:81-85).

    STUB: PDF table extraction needs tabula/jpype, which this
    environment does not ship. The real implementation is a
    binaryFile scan + mapInPandas decode (same plumbing as
    operators/multimodal.py); until then callers pass the extracted
    rows directly to `zhou_transform`.
    """
    raise NotImplementedError(
        "PDF table extraction requires tabula; pass the extracted rows "
        "to zhou_transform(spark, rows_df) instead"
    )


def zhou_transform(spark: SparkSession, rows: DataFrame
                   ) -> tuple[DataFrame, DataFrame]:
    """Fig-3 table rows → (nodes, edges) (zhou_transform.py:96-150).

    `rows` must carry TABLE_COLUMNS. Unknown coronavirus names raise at
    evaluation, matching zhou_transform.py:98-101."""
    lit = F.lit
    taxon = F.map_from_arrays(
        F.array(*[lit(k) for k in CORONA_TAXON]),
        F.array(*[lit(str(v)) for v in CORONA_TAXON.values()]),
    )
    checked = rows.withColumn(
        "corona_curie",
        F.when(
            taxon[F.col("Coronavirus")].isNotNull(),
            F.concat(lit("NCBITaxon:"), taxon[F.col("Coronavirus")]),
        ).otherwise(
            F.raise_error(
                F.concat(
                    lit("Can't find info for coronavirus "),
                    F.col("Coronavirus"),
                )
            )
        ),
    )
    gene_id = F.concat(lit("NCBIGene:"), F.col("Host Gene ID"))
    gene_nodes = checked.select(
        gene_id.alias("id"),
        F.col("Host Protein").alias("name"),
        lit("biolink:Gene").alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    virus_nodes = checked.select(
        F.col("corona_curie").alias("id"),
        F.col("Coronavirus").alias("name"),
        lit("biolink:OrganismalEntity").alias("category"),
        lit(SOURCE).alias("provided_by"),
    )
    # reference writes both nodes per row, no dedup (zhou_transform.py:105-129)
    nodes = gene_nodes.unionByName(virus_nodes).select(*ZHOU_NODE_COLS)
    edges = checked.select(
        gene_id.alias("subject"),
        lit("biolink:interacts_with").alias("predicate"),
        F.col("corona_curie").alias("object"),
        lit("RO:0002437").alias("relation"),
        lit(SOURCE).alias("provided_by"),
        lit("biolink:Association").alias("type"),
        F.concat(lit("PMID:"), F.col("PubMed ID")).alias("publication"),
    ).select(*ZHOU_EDGE_COLS)
    return nodes, edges
