"""spark-submit entry point — the north-rule ship path:

    zip -r kg_covid_19_spark.zip kg_covid_19_spark  (or session.package_zip)
    spark-submit --master <cluster> --py-files kg_covid_19_spark.zip \
        tools/submit_job.py <sf_dir>

Builds the KG end-to-end and prints one JSON summary line. The script
imports the package ONLY through the shipped --py-files archive (no
repo on sys.path), proving executors and driver resolve the engine from
the artifact exactly as a multi-executor cluster would.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("kg-submit").getOrCreate()
    # the package must come from --py-files, not the filesystem
    from kg_covid_19_spark.plans.pipeline import build_kg

    t0 = time.time()
    nodes, edges = build_kg(spark, sf_dir)
    summary = {
        "sf_dir": sf_dir,
        "n_nodes": nodes.count(),
        "n_edges": edges.count(),
        "sec": round(time.time() - t0, 3),
        "shipped_via": "--py-files",
    }
    print("KG_SUBMIT_RESULT " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
