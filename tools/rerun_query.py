"""Rerun one bench query N times back-to-back to separate load jitter from
a real plan regression (the q05 protocol from BENCH_r03 notes).

Usage: python tools/rerun_query.py q01_pricing_summary [runs]
Prints per-run warm seconds, min/median/max, and the physical plan's join/
exchange census so a plan change is visible alongside the timings.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.queries import QUERIES
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="rerun", cpus=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    fn = QUERIES[name].fn

    # one cold run to pay codegen, then N timed warm runs
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    release_intermediates()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        release_intermediates()

    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    census = {
        k: len(re.findall(k, plan))
        for k in ("BroadcastHashJoin", "SortMergeJoin", "Exchange", "SinglePartition")
    }
    times_sorted = sorted(times)
    print(
        json.dumps(
            {
                "query": name,
                "runs": times,
                "min": times_sorted[0],
                "median": times_sorted[len(times) // 2],
                "max": times_sorted[-1],
                "plan_census": census,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
