"""YAML-driven merge — the reference's `run.py merge -y merge.yaml`
entry point (merge_kg.py:9-34) over the Spark merge stage.

`parse_load_config` is the reference's loader verbatim-in-contract
(merge_kg.py:9-19). `load_and_merge_from_yaml` replaces the KGX merge
call: it validates every source input file up front (KGX raises
FileNotFoundError on a missing input — tests/test_run.py:22-30 asserts
that path; we raise the same type eagerly with the offending paths),
reads each source's node/edge TSVs, applies the per-source
filters/operations blocks (merge.yaml:27-47), merges with
union-with-provenance + edge-key dedup, and optionally writes the
destination with its `property_types` casts (merge.yaml:123-144).
"""

from __future__ import annotations

import os

import yaml
from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import graph_stats, load_and_merge
from ..sources.kgx import write_kgx


def parse_load_config(yaml_file: str) -> dict:
    """merge.yaml → dict (merge_kg.py:9-19)."""
    with open(yaml_file) as fh:
        return yaml.load(fh, Loader=yaml.FullLoader)


def _read_tsv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("sep", "\t").option("header", True).csv(path)
    )


def load_and_merge_from_yaml(
    spark: SparkSession,
    yaml_file: str,
    out_dir: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (merged_nodes, merged_edges, stats); writes `out_dir` when given.

    Raises FileNotFoundError listing every missing source input (the
    reference's merge error contract, tests/test_run.py:22-30)."""
    config = parse_load_config(yaml_file)
    graph = config.get("merged_graph", config)
    source_blocks: dict = graph["source"]

    missing = [
        f
        for block in source_blocks.values()
        for f in block.get("input", {}).get("filename", [])
        if not os.path.exists(f)
    ]
    if missing:
        raise FileNotFoundError(
            f"merge input file(s) do not exist: {', '.join(missing)}"
        )

    sources: dict[str, tuple[DataFrame, DataFrame]] = {}
    merge_cfg: dict[str, dict] = {}
    for name, block in source_blocks.items():
        files = block["input"]["filename"]
        nodes_files = [f for f in files if "node" in os.path.basename(f)]
        edges_files = [f for f in files if "edge" in os.path.basename(f)]
        if not nodes_files or not edges_files:
            raise ValueError(
                f"source {name!r} needs one nodes and one edges file"
            )
        sources[name] = (
            _read_tsv(spark, nodes_files[0]),
            _read_tsv(spark, edges_files[0]),
        )
        cfg: dict = {}
        if "filters" in block:
            cfg["node_filters"] = block["filters"].get("node_filters")
            cfg["edge_filters"] = block["filters"].get("edge_filters")
        if "operations" in block:
            cfg["operations"] = [
                {
                    "name": op["name"].rsplit(".", 1)[-1],
                    "args": op.get("args", {}),
                }
                for op in block["operations"]
            ]
        merge_cfg[name] = cfg

    nodes, edges, stats = load_and_merge(sources, merge_cfg)

    if out_dir is not None:
        dest = graph.get("destination", {})
        ptypes = None
        if isinstance(dest, dict):
            for block in (
                dest.values() if "format" not in dest else [dest]
            ):
                if isinstance(block, dict) and "property_types" in block:
                    ptypes = block["property_types"]
                    break
        write_kgx(nodes, edges, out_dir, property_types=ptypes)
    return nodes, edges, stats
