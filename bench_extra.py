"""Optimization-round instrumentation (guide §1): times every benched
query exactly like bench.py (same session factory, same order, same
``.agg(count(*)).collect()`` methodology) but additionally records, per
query, the number of Spark jobs / stages / tasks and the summed task
time via the status tracker. Overhead-bound queries (many tiny stages)
separate from data-bound ones (few stages, high task time).

Usage: python bench_extra.py [query ...]   # default: full bench list
Output: one JSON line per query to stdout; human table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench_callables():
    """The exact (name → fn) map bench.py times, in bench order."""
    from kg_covid_19_spark.operators.triples import kg_openie_triples
    from kg_covid_19_spark.plans.queries import KG_QUERIES
    import bench

    out = {}
    for name in bench.BENCH_QUERIES:
        out[name] = KG_QUERIES[name]
    out["kg_openie_triples"] = kg_openie_triples
    out.update(bench.PIPELINE_BENCH)
    return out


def run(names=None) -> None:
    from kg_covid_19_spark.plans.pipeline import get_kg
    from kg_covid_19_spark.session import get_spark

    spark = get_spark(app_name="kg-spark-bench-extra")
    sc = spark.sparkContext
    spark.range(1).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(64).repartition(32).select(_warm("id")).count()

    tracker = sc.statusTracker()

    # the frozen bench.py host-speed probe, so cross-run comparisons can
    # be calibrated (observed 2x host oscillation on this VM)
    import bench as _bench

    calib = _bench._calibrate(spark)
    print(json.dumps({"calib": calib}), flush=True)
    print(f"calib: {calib}", file=sys.stderr, flush=True)

    def _measure(label, thunk):
        sc.setJobGroup(label, label)
        t0 = time.time()
        thunk()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(label)
        stages, tasks = set(), 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None and s not in stages:
                    stages.add(s)
                    tasks += si.numTasks
        rec = {
            "query": label,
            "sec": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "n_tasks": tasks,
        }
        print(json.dumps(rec), flush=True)
        print(
            f"{label:32s} {wall:8.3f}s  jobs={len(jobs):3d} "
            f"stages={len(stages):3d} tasks={tasks:5d}",
            file=sys.stderr,
            flush=True,
        )

    _measure("kg_build", lambda: get_kg(spark, SF_DIR))
    cals = bench_callables()
    if names:
        cals = {n: cals[n] for n in names if n in cals}
    # absorb first-query codegen warmup like bench.py does
    from kg_covid_19_spark.plans.queries import KG_QUERIES

    KG_QUERIES["kg_category_counts"](spark, SF_DIR).agg(F.count("*")).collect()
    for name, fn in cals.items():
        _measure(
            name,
            lambda fn=fn: fn(spark, SF_DIR).agg(F.count("*")).collect(),
        )
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1:] or None)
