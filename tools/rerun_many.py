#!/usr/bin/env python
"""rerun_protocol over a list of queries in ONE session — the r15
optimization round's A/B harness (before = stashed HEAD code, after =
working tree), avoiding a session spin-up per query.

Usage: python tools/rerun_many.py out.json q01 q02 ... [--runs=4]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    runs = 4
    names = []
    for a in sys.argv[2:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
        else:
            names.append(a)

    from bench import CPUS, SF_DIR, rerun_protocol
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="rerun_many", cpus=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out = {}
    for name in names:
        out[name] = rerun_protocol(spark, name, runs)
        print(name, out[name]["min"], out[name]["median"], flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
