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


def write_kgx(nodes: DataFrame, edges: DataFrame, out_dir: str,
              single_file: bool = False) -> None:
    n, e = (nodes, edges)
    if single_file:
        n, e = nodes.coalesce(1), edges.coalesce(1)
    for df, name in ((n, "nodes"), (e, "edges")):
        (
            df.write.mode("overwrite")
            .option("sep", "\t")
            .option("header", True)
            .option("emptyValue", "")  # missing → '' like write_node_edge_item
            .csv(f"{out_dir}/{name}")
        )


def read_kgx(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    def rd(name: str) -> DataFrame:
        return (
            spark.read.option("sep", "\t")
            .option("header", True)
            .csv(f"{out_dir}/{name}")
        )

    return rd("nodes"), rd("edges")
