#!/usr/bin/env python
"""One-off DuckDB-oracle parity check for a list of queries.

Usage: python tools/check_queries.py q230_gopher_repetition [...] [--sf 0.001,0.01]

The r15 optimization loop's inner gate: every touched query re-verifies
against its oracle at the given SFs before its change is committed.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sfs = ["0.001", "0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")

    from oracle_check import check_query, duckdb_conn

    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from osmapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="check_queries", cpus=8, shuffle_partitions=8)
    failures = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb_conn(sf_dir)
        for name in args:
            issues = check_query(spark, con, name, sf_dir)
            release_intermediates()
            status = "OK " if not issues else "FAIL"
            print(f"{status} sf{sf} {name}" + ("" if not issues else f" :: {issues}"))
            failures += bool(issues)
        con.close()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
