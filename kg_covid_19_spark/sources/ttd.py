"""TTD record-block parser + transform (SURVEY.md S11, E6, J8).

Reference: kg_covid_19/transform_utils/ttd/ttd.py:208-278 — a stateful
line parser that skips everything before the second dashed line, then
groups ``target_id → abbrev → list of entries`` where an entry is either
the single third field (UNIPROID additionally split on '; ') or the list
of fields 3..n.

Spark re-expression: the statefulness ("have I seen 2 dashed lines yet")
is a running count over file order — a cumulative window over the line
index. A single raw TTD download is one text split, so the window is
partition-local; for a directory of many downloads the same plan runs
per-file via input_file_name() partitioning.

Goldens: tests/test_ttd_transform.py:44-80 (parsed keys and values).
The reference's full run() additionally requires an SSSOM map file that
is absent from its own tree (normalize_curies would raise), so the
transform here treats normalization as identity-on-missing, matching
normalize_utils.py:36-44 semantics.

Quirk reproduced deliberately: for a target whose UNIPROID entry is a
single name (no '; '), the reference iterates the *string*, looking up
individual characters in the UniProt map (ttd.py:178-185 —
``uniprot_names = uniproid_struct[0]`` then ``for this_name in
uniprot_names``) — so such targets emit drug nodes but no protein nodes
or edges. Triple parity requires reproducing that behavior, not fixing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def parse_ttd_blocks(spark: SparkSession, path: str) -> DataFrame:
    """→ (target_id, abbrev, entries array<array<string>>), one row per
    (target, abbrev), entries in file order.

    Scale note: the unpartitioned cumulative window below is a
    deliberate single-reducer pass — the TTD raw file is a small flat
    dictionary download (MBs; the reference parses it single-threaded,
    ttd.py:208-278), and the format's "skip until the 2nd dashed line"
    rule is inherently sequential over the file. Corpus-sized inputs
    never come through this path."""
    raw = (
        spark.read.text(path)
        .withColumn("_lid", F.monotonically_increasing_id())
    )
    w = Window.orderBy("_lid").rowsBetween(Window.unboundedPreceding, 0)
    dashed = F.col("value").rlike(r"^-+\s*$")
    body = (
        raw.withColumn("n_dashed", F.sum(dashed.cast("int")).over(w))
        .filter(~dashed & (F.col("n_dashed") >= 2))
        .filter(~F.col("value").rlike(r"^\s*$"))
        .withColumn("fields", F.split(F.rtrim("value"), "\t"))
        .filter(F.size("fields") >= 3)
    )
    # entry value: single third field → [field3] (UNIPROID '; '-split),
    # else fields 3..n
    third = F.element_at("fields", 3)
    entry = F.when(
        F.size("fields") == 3,
        F.when(
            (F.element_at("fields", 2) == "UNIPROID") & third.contains("; "),
            F.split(third, "; "),
        ).otherwise(F.array(third)),
    ).otherwise(F.slice("fields", 3, F.size("fields") - 2))
    rows = body.select(
        F.element_at("fields", 1).alias("target_id"),
        F.element_at("fields", 2).alias("abbrev"),
        entry.alias("entry"),
        F.when(F.size("fields") == 3, ~(
            (F.element_at("fields", 2) == "UNIPROID") & third.contains("; ")
        )).otherwise(F.lit(False)).alias("is_scalar"),
        "_lid",
    )
    return rows.groupBy("target_id", "abbrev").agg(
        F.array_sort(
            F.collect_list(F.struct("_lid", "entry", "is_scalar"))
        ).alias("ordered"),
    ).select(
        "target_id",
        "abbrev",
        F.transform("ordered", lambda s: s["entry"]).alias("entries"),
        F.transform("ordered", lambda s: s["is_scalar"]).alias("scalars"),
    )


def ttd_transform(spark: SparkSession, input_dir: str,
                  data_file: str = "P1-01-TTD_target_download_SNIPPET.txt",
                  idmap_file: str | None = None,
                  ) -> tuple[DataFrame, DataFrame]:
    """TTD → (nodes, edges), reference run() semantics (ttd.py:41-169).

    Targets need both UNIPROID and DRUGINFO; protein nodes come from the
    first UNIPROID entry's names mapped through the UniProt name→accession
    dictionary (chars of the name when the entry was a scalar — see module
    docstring); a drug node is written per DRUGINFO entry (no dedup, as in
    the reference); edges are the drug × uniprot cross product (E6).
    """
    blocks = parse_ttd_blocks(spark, f"{input_dir}/{data_file}")

    per_target = blocks.groupBy("target_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("abbrev", F.struct("entries", "scalars")))
        ).alias("m")
    )
    has = lambda k: F.col("m").getItem(k).isNotNull()  # noqa: E731
    targets = per_target.filter(has("UNIPROID") & has("DRUGINFO"))

    first_uni = F.col("m").getItem("UNIPROID")["entries"].getItem(0)
    first_uni_scalar = F.col("m").getItem("UNIPROID")["scalars"].getItem(0)
    # scalar entry → iterate characters (reference quirk); list → names
    names = F.when(
        first_uni_scalar,
        F.split(first_uni.getItem(0), ""),
    ).otherwise(first_uni)

    gene_name = F.coalesce(
        F.col("m").getItem("GENENAME")["entries"].getItem(0).getItem(0), F.lit("")
    )
    targ_type = F.coalesce(
        F.col("m").getItem("TARGTYPE")["entries"].getItem(0).getItem(0), F.lit("")
    )

    t = targets.select(
        "target_id",
        F.explode_outer(names).alias("uni_name"),
        gene_name.alias("gene_name"),
        targ_type.alias("targ_type"),
        F.col("m").getItem("DRUGINFO")["entries"].alias("drugs"),
    )

    if idmap_file:
        idmap = (
            spark.read.option("sep", "\t").csv(f"{input_dir}/{idmap_file}")
            .withColumn("_lid", F.monotonically_increasing_id())
            .groupBy(F.col("_c2").alias("uni_name"))
            .agg(F.max_by("_c0", "_lid").alias("uniprot"))
        )
        mapped = t.join(F.broadcast(idmap), "uni_name", "left")
    else:
        mapped = t.withColumn("uniprot", F.lit(None).cast("string"))

    with_ids = mapped.withColumn(
        "protein_id",
        F.when(
            F.col("uniprot").isNotNull(),
            F.concat(F.lit("UniProtKB:"), "uniprot"),
        ),
    )

    protein_nodes = with_ids.filter(F.col("protein_id").isNotNull()).select(
        F.col("protein_id").alias("id"),
        F.col("gene_name").alias("name"),
        F.lit("biolink:Protein").alias("category"),
        F.col("target_id").alias("TTD_ID"),
        F.lit("ttd").alias("provided_by"),
    ).distinct()

    per_target_drugs = targets.select(
        "target_id",
        F.explode(F.col("m").getItem("DRUGINFO")["entries"]).alias("drug"),
    ).select(
        "target_id",
        F.concat(F.lit("ttd.drug:"), F.col("drug").getItem(0)).alias("drug_curie"),
        F.col("drug").getItem(0).alias("ttd_drug_id"),
        F.col("drug").getItem(1).alias("drug_name"),
    )
    drug_nodes = per_target_drugs.select(
        F.col("drug_curie").alias("id"),
        F.col("drug_name").alias("name"),
        F.lit("biolink:Drug").alias("category"),
        F.col("ttd_drug_id").alias("TTD_ID"),
        F.lit("ttd").alias("provided_by"),
    )

    edges = (
        per_target_drugs.join(
            with_ids.filter(F.col("protein_id").isNotNull())
            .select("target_id", "protein_id", "targ_type"),
            "target_id",
        )
        .select(
            F.col("drug_curie").alias("subject"),
            F.lit("biolink:interacts_with").alias("predicate"),
            F.col("protein_id").alias("object"),
            F.lit("RO:0002436").alias("relation"),
            F.lit("ttd").alias("provided_by"),
            F.lit("biolink:Association").alias("type"),
            F.col("targ_type").alias("target_type"),
        )
    )

    nodes = protein_nodes.unionByName(drug_nodes)
    return nodes, edges
