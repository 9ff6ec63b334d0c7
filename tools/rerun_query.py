"""Rerun one bench query N times back-to-back to separate load jitter from
a real plan regression (the q05 protocol from BENCH_r03 notes).

Usage: python tools/rerun_query.py q01_pricing_summary [runs]
Prints per-run warm seconds, min/median/max, and the physical plan's join/
exchange census so a plan change is visible alongside the timings.

Since r7 the protocol itself lives in bench.rerun_protocol — bench.py
auto-invokes it for every >20% warm flag at the end of a run (the flag's
"rerun" block in the record); this CLI wraps the same function for manual
investigation so both paths can never diverge.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from bench import CPUS, SF_DIR, rerun_protocol
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="rerun", cpus=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out = {"query": name, **rerun_protocol(spark, name, runs)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
