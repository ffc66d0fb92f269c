"""KGX TSV sink/source — the engine's canonical output format.

Reference: every transform writes header + tab-joined rows
(utils/transform_utils.py:71-85, write_node_edge_item), one nodes.tsv +
edges.tsv per source under data/transformed/<source>/; the merge writes the
same shape tarred (merge.yaml:123-144). Multi-valued properties are
'|'-joined at export (chembl_transform.py:389-392); score columns get float
casts (merge.yaml:128-144).

Spark sink: header'd tab-separated CSV. At scale each source directory is
written with as many part files as there are partitions — a single-file
TSV (the reference's shape) is a `coalesce(1)` away and only sensible for
small exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# merge.yaml:128-144 — the reference's K2 property_types block: every
# non-canonical score property is typed xsd:float at export.
MERGE_PROPERTY_TYPES: dict[str, str] = {
    prop: "xsd:float"
    for prop in (
        "combined_score", "confidence_score", "neighborhood",
        "neighborhood_transferred", "fusion", "cooccurence", "homology",
        "coexpression", "coexpression_transferred", "experiments",
        "experiments_transferred", "database", "database_transferred",
        "textmining", "textmining_transferred",
    )
}

_XSD_TO_SPARK = {
    "xsd:float": "float",
    "xsd:double": "double",
    "xsd:integer": "long",
    "xsd:boolean": "boolean",
    "xsd:string": "string",
}


def apply_property_types(df: DataFrame,
                         property_types: dict[str, str]) -> DataFrame:
    """KGX `property_types` casts (merge.yaml:128-144): columns named in
    the map are cast to the declared XSD type; empty strings become null
    (the TSV missing-value convention) rather than cast errors; absent
    columns are ignored, as KGX does for sources lacking the property."""
    out = df
    for colname, xsd in property_types.items():
        if colname not in out.columns:
            continue
        spark_type = _XSD_TO_SPARK[xsd]
        c = F.col(colname)
        out = out.withColumn(
            colname,
            F.when(c.cast("string") == "", None).otherwise(c).cast(spark_type),
        )
    return out


def write_kgx(nodes: DataFrame, edges: DataFrame, out_dir: str,
              single_file: bool = False,
              property_types: dict[str, str] | None = None,
              node_partition_by: list[str] | None = None,
              edge_partition_by: list[str] | None = None,
              fmt: str = "tsv") -> None:
    """``*_partition_by``: hive-style partitioned layout (e.g. nodes by
    category, edges by predicate) — at 100 TB this is what makes the
    merged artifact queryable with partition pruning; readers filtering
    on the partition column never touch the other directories.

    ``fmt``: 'tsv' (the reference's write_node_edge_item shape, missing
    values as '') or 'jsonl' (KGX's other interchange format — one JSON
    object per line, nulls omitted per KGX convention)."""
    if fmt not in ("tsv", "jsonl"):
        raise ValueError(f"unsupported KGX format {fmt!r}")
    n, e = (nodes, edges)
    if property_types:
        n = apply_property_types(n, property_types)
        e = apply_property_types(e, property_types)
    if single_file:
        n, e = n.coalesce(1), e.coalesce(1)
    for df, name, pb in (
        (n, "nodes", node_partition_by),
        (e, "edges", edge_partition_by),
    ):
        if fmt == "jsonl":
            writer = df.write.mode("overwrite")
            if pb:
                writer = writer.partitionBy(*pb)
            writer.json(f"{out_dir}/{name}")
            continue
        writer = (
            df.write.mode("overwrite")
            .option("sep", "\t")
            .option("header", True)
            .option("emptyValue", "")  # missing → '' like write_node_edge_item
        )
        if pb:
            writer = writer.partitionBy(*pb)
        writer.csv(f"{out_dir}/{name}")


def read_kgx(spark: SparkSession, out_dir: str,
             fmt: str = "tsv") -> tuple[DataFrame, DataFrame]:
    def rd(name: str) -> DataFrame:
        if fmt == "jsonl":
            return spark.read.json(f"{out_dir}/{name}")
        return (
            spark.read.option("sep", "\t")
            .option("header", True)
            .csv(f"{out_dir}/{name}")
        )

    return rd("nodes"), rd("edges")


def package_kgx_tar(out_dir: str, tar_path: str) -> None:
    """Package a written KGX tree as <name>.tar.gz — the reference
    merge's published artifact shape (merge.yaml:123-136 writes
    merged-kg.tar.gz). Driver-side by design: tarring is artifact
    publication of already-distributed output, not data processing.
    The archive is byte-reproducible: members sorted, tar headers
    normalized (mtime/uid/gid 0, no user/group names), and the gzip
    stream written with mtime=0 — identical inputs produce identical
    bytes on any host at any time."""
    import gzip
    import os
    import tarfile

    def _scrub(ti: tarfile.TarInfo) -> tarfile.TarInfo:
        ti.mtime = 0
        ti.uid = ti.gid = 0
        ti.uname = ti.gname = ""
        ti.mode = 0o644  # pin: host umask must not leak into the header
        return ti

    # filename="" keeps the gzip FNAME field empty (a named GzipFile
    # embeds the output basename in the header — path-dependent bytes)
    with open(tar_path, "wb") as fh, \
            gzip.GzipFile(filename="", mode="wb",
                          fileobj=fh, mtime=0) as raw, \
            tarfile.open(fileobj=raw, mode="w") as tar:
        members = []
        for sub in ("nodes", "edges"):
            root = os.path.join(out_dir, sub)
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if f.startswith(("_", ".")):
                        continue  # spark _SUCCESS / checksums
                    full = os.path.join(dirpath, f)
                    members.append(
                        (os.path.relpath(full, out_dir), full)
                    )
        if not members:
            raise FileNotFoundError(
                f"no KGX part files under {out_dir}/nodes or /edges — "
                "refusing to publish an empty artifact"
            )
        for arcname, full in sorted(members):
            tar.add(full, arcname=arcname, filter=_scrub)
