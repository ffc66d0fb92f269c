"""YAML merge entry point (merge_kg.py:9-34 + tests/test_run.py:22-30)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kg_covid_19_spark.plans.merge_config import (
    load_and_merge_from_yaml,
    parse_load_config,
)

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference tree")
def test_parse_reference_merge_yaml():
    cfg = parse_load_config(f"{REF}/merge.yaml")
    sources = cfg["merged_graph"]["source"]
    assert len(sources) == 14
    assert "STRING" in sources and "intact" in sources
    dest = cfg["merged_graph"]["destination"]
    assert dest["merged-kg-tsv"]["property_types"]["combined_score"] == (
        "xsd:float"
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference tree")
def test_merge_missing_file_error(spark):
    # the reference's own fixture + error contract (test_run.py:22-30)
    with pytest.raises(FileNotFoundError, match="do not exist"):
        load_and_merge_from_yaml(
            spark, f"{REF}/tests/resources/merge_MISSING_FILE.yaml"
        )


def test_yaml_merge_end_to_end(spark, tmp_path):
    from kg_covid_19_spark.sources.kgx import write_kgx

    a_nodes = spark.createDataFrame(
        [("X:1", "x", "biolink:Protein", "a", "UniProtKB:P7"),
         ("X:2", "y", "biolink:Drug", "a", "")],
        "id string, name string, category string, provided_by string, "
        "xrefs string",
    )
    a_edges = spark.createDataFrame(
        [("X:1", "biolink:interacts_with", "X:2", "RO:1", "a")],
        "subject string, predicate string, object string, relation string, "
        "provided_by string",
    )
    b_nodes = spark.createDataFrame(
        [("UniProtKB:P7", "x", "biolink:Protein", "b", "")],
        "id string, name string, category string, provided_by string, "
        "xrefs string",
    )
    b_edges = spark.createDataFrame(
        [("UniProtKB:P7", "biolink:interacts_with", "X:2", "RO:1", "b"),
         ("UniProtKB:P7", "biolink:interacts_with", "X:2", "RO:1", "b")],
        "subject string, predicate string, object string, relation string, "
        "provided_by string",
    )
    write_kgx(a_nodes, a_edges, str(tmp_path / "a"))
    write_kgx(b_nodes, b_edges, str(tmp_path / "b"))

    yml = tmp_path / "merge.yaml"
    yml.write_text(
        f"""
merged_graph:
  source:
    a:
      input:
        format: tsv
        filename:
          - {tmp_path}/a/nodes
          - {tmp_path}/a/edges
      operations:
        - name: kgx.utils.graph_utils.remap_node_identifier
          args:
            category: biolink:Protein
            alternative_property: xrefs
            prefix: UniProtKB
    b:
      input:
        format: tsv
        filename:
          - {tmp_path}/b/nodes
          - {tmp_path}/b/edges
  destination:
    merged-kg-tsv:
      format: tsv
      filename: merged-kg
      property_types:
        combined_score: 'xsd:float'
"""
    )
    nodes, edges, stats = load_and_merge_from_yaml(
        spark, str(yml), out_dir=str(tmp_path / "out")
    )
    n = {r.id: r for r in nodes.collect()}
    # a's X:1 remapped to UniProtKB:P7 and fused with b's node
    assert sorted(n) == ["UniProtKB:P7", "X:2"]
    assert n["UniProtKB:P7"].provided_by == "a|b"
    e = [tuple(r) for r in edges.collect()]
    # a's remapped edge and b's duplicate collapse onto one key
    assert len(e) == 1
    assert e[0][:4] == ("UniProtKB:P7", "biolink:interacts_with", "X:2", "RO:1")
    assert e[0][4] == "a|b"
    assert stats.filter(F.col("kind") == "edge").count() >= 1
    assert os.path.isdir(tmp_path / "out" / "nodes")
