"""The complete reference workflow — `run.py transform` → `run.py merge
-y merge.yaml` → query — executed end-to-end through this engine's entry
points on the reference's own fixtures. A user of the reference could
run this exact sequence here."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kg_covid_19_spark.plans.merge_config import load_and_merge_from_yaml
from kg_covid_19_spark.sources.registry import transform

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def test_transform_merge_query_workflow(spark, tmp_path):
    res = f"{REF}/tests/resources"
    raw = tmp_path / "raw"
    # stage two sources (reference fixture layouts)
    sd = raw / "StringTransform"
    sd.mkdir(parents=True)
    for f in ("gene2ensembl.gz", "gene_info.gz",
              "HUMAN_9606_idmapping.dat.gz",
              "9606.protein.links.full.v11.5.txt.gz"):
        shutil.copy(f"{res}/string/{f}", sd / f)
    dd = raw / "DrugCentralTransform"
    dd.mkdir()
    shutil.copy(
        f"{res}/drug_central/drug.target.interaction_SNIPPET.tsv.gz",
        dd / "drug.target.interaction_SNIPPET.tsv.gz",
    )

    # 1. transform (run.py transform -s ...)
    out = tmp_path / "transformed"
    transform(spark, str(raw), str(out),
              sources=["StringTransform", "DrugCentralTransform"])

    # 2. merge (run.py merge -y merge.yaml) — with the reference's STRING
    #    filters + UniProtKB remap block (merge.yaml:27-47)
    yml = tmp_path / "merge.yaml"
    yml.write_text(f"""
merged_graph:
  source:
    STRING:
      input:
        format: tsv
        filename:
          - {out}/StringTransform/nodes
          - {out}/StringTransform/edges
      filters:
        node_filters:
          category:
            - biolink:Gene
            - biolink:Protein
        edge_filters:
          subject_category:
            - biolink:Gene
            - biolink:Protein
          object_category:
            - biolink:Gene
            - biolink:Protein
          edge_label:
            - biolink:interacts_with
            - biolink:has_gene_product
      operations:
        - name: kgx.utils.graph_utils.remap_node_identifier
          args:
            category: biolink:Protein
            alternative_property: xrefs
            prefix: UniProtKB
    drug_central:
      input:
        format: tsv
        filename:
          - {out}/DrugCentralTransform/nodes
          - {out}/DrugCentralTransform/edges
  destination:
    merged-kg-tsv:
      format: tsv
      filename: merged-kg
      property_types:
        combined_score: 'xsd:float'
""")
    merged_dir = tmp_path / "merged"
    nodes, edges, stats = load_and_merge_from_yaml(
        spark, str(yml), out_dir=str(merged_dir)
    )
    n_nodes, n_edges = nodes.count(), edges.count()
    assert n_nodes > 0 and n_edges > 0
    # provenance accumulated across both sources
    assert {r.provided_by for r in nodes.collect()} >= {
        "STRING", "drug_central"
    }
    # STRING proteins remapped onto UniProtKB ids where xrefs existed
    assert nodes.filter(F.col("id").startswith("UniProtKB:")).count() > 0
    assert os.path.isdir(merged_dir / "nodes")

    # 3. query (query-01 category counts over the merged graph)
    nodes.createOrReplaceTempView("merged_nodes_wf")
    q1 = spark.sql(
        "SELECT category, count(*) AS n FROM merged_nodes_wf "
        "GROUP BY category"
    ).collect()
    assert sum(r.n for r in q1) == n_nodes
    assert {r.category for r in q1} >= {"biolink:Protein", "biolink:Drug"}
