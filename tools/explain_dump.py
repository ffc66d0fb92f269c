"""Dump ``explain("formatted")`` for named bench queries to
plans/r07/<query>_<tag>.txt — the judge-checkable plan evidence for the
optimization round.

Usage: python tools/explain_dump.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07"
)


def formatted(spark, df) -> str:
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from bench_extra import bench_callables
    from kg_covid_19_spark.session import get_spark

    spark = get_spark(app_name="kg-spark-explain")
    cals = bench_callables()
    for name in names:
        df = cals[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(formatted(spark, df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
