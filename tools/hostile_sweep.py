#!/usr/bin/env python
"""Hostile-config full-catalog oracle sweep (round-close gate).

Re-runs every oracle-checkable catalog query through the driver-identical
comparison (tests/oracle_check.check_query) under a deliberately foreign
configuration the standard gates never exercise:

- cwd is a throwaway temp directory (NOT the repo — catches relative-path
  and spark-warehouse assumptions),
- ``spark.sql.session.timeZone = Australia/Eucla`` (+8:45 — catches any
  session-zone leakage into date/window arithmetic; this config found the
  real q148 week-boundary bug in r7),
- 16 shuffle partitions (neither the test suite's 8 nor the driver's 32).

Usage:  python tools/hostile_sweep.py [--aqe-off] [--partitions N] [names...]
(default: full catalog, AQE on, 16 shuffle partitions)
--aqe-off      : spark.sql.adaptive.enabled=false (proves correctness never
                 leans on AQE's runtime re-planning — one run per round)
--partitions N : shuffle-partition override; N=1 is the degenerate-
                 parallelism probe (broadcast offsets, ranged prefix sums,
                 and partition-count-derived defaults must hold at nparts=1)
Exit code 0 = all green; prints one line per failure.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    os.chdir(tempfile.mkdtemp(prefix="hostile_cwd_"))

    from pyspark.sql import SparkSession

    from osmapreduceproject_spark.queries import QUERIES
    from tests.oracle_check import check_query, duckdb_conn

    args = sys.argv[1:]
    aqe = "true"
    partitions = "16"
    if "--aqe-off" in args:
        args.remove("--aqe-off")
        aqe = "false"
    if "--partitions" in args:
        i = args.index("--partitions")
        if (
            i + 1 >= len(args)
            or not args[i + 1].isdigit()
            or int(args[i + 1]) < 1
        ):
            print("usage: --partitions N (a positive integer)", file=sys.stderr)
            return 2
        partitions = args[i + 1]
        del args[i : i + 2]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hostile_sweep")
        .config("spark.sql.shuffle.partitions", partitions)
        .config("spark.sql.session.timeZone", "Australia/Eucla")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", aqe)
        .getOrCreate()
    )
    duck = duckdb_conn(SF_DIR)
    names = args or [n for n, s in QUERIES.items() if s.oracle is not None]
    failures = 0
    for i, name in enumerate(names, 1):
        try:
            issues = check_query(spark, duck, name, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — a sweep must report, not die
            issues = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if issues:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(issues), flush=True)
        if i % 25 == 0:
            print(f"... {i}/{len(names)} swept, {failures} failures", flush=True)
    print(
        f"hostile sweep (aqe={aqe}, partitions={partitions}): "
        f"{len(names) - failures}/{len(names)} green"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
