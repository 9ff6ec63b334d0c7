"""CLI entry point mirroring the reference programs' command lines
(``/root/reference/README.md:30-42``), so a reference user can switch
with an almost-identical invocation::

    # reference:  ./parallel_sort    --mode thread --workers 4 --size 131072
    python -m osmapreduceproject_spark sort --workers 4 --size 131072

    # reference:  ./max_aggregation  --mode proc   --workers 8 --size 1000000
    python -m osmapreduceproject_spark max  --workers 8 --size 1000000

``--mode thread|proc`` is accepted for drop-in compatibility and mapped
to the same execution: Spark's local-mode executor threads subsume the
reference's thread/process distinction (the shuffle service plays the
role of its shared-memory staging; SURVEY.md §2.A S3). The report mirrors
``parallel_sort.cpp:144-152`` / ``max_aggregation.cpp:64-69``: phase
times in ms, verification flag (sort) or final value (max), peak RSS.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m osmapreduceproject_spark")
    p.add_argument("which", choices=["sort", "max"], help="reference program to run")
    p.add_argument("--mode", choices=["thread", "proc"], default="thread",
                   help="accepted for reference CLI parity; both map to "
                        "local-mode executor threads")
    p.add_argument("--workers", type=int, default=4, help="parallelism (local[N])")
    p.add_argument("--size", type=int, default=131072, help="number of integers")
    p.add_argument("--seed", type=int, default=42, help="data-generation seed")
    args = p.parse_args(argv)

    from .mapreduce import run_conformance
    from .session import get_spark

    spark = get_spark(app_name=f"conf_{args.which}", cpus=args.workers,
                      shuffle_partitions=args.workers)
    try:
        r = run_conformance(spark, n=args.size, seed=args.seed,
                            which=args.which, workers=args.workers)
    finally:
        spark.stop()

    print(f"Mode: {args.mode}, workers={args.workers}, size={args.size}")
    for key, ms in r.items():
        if key.endswith("_ms") and key != "total_ms":
            print(f"{key[:-3].capitalize()} time (ms): {ms}")
    print(f"Total time (ms): {r.get('total_ms')}")
    if args.which == "sort":
        print(f"Sorted OK: {'yes' if r.get('sorted_ok') else 'NO'}")
    else:
        print(f"Final max: {r.get('final_max')}")
    if "peak_rss_kb" in r:
        print(f"Peak RSS (KB): {r['peak_rss_kb']}")
    return 0 if (args.which == "max" or r.get("sorted_ok")) else 1


if __name__ == "__main__":
    sys.exit(main())
