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

Beyond the reference surface, ``curate`` runs the end-to-end corpus
curation pipeline (pipelines.curate_corpus) over a documents parquet::

    python -m osmapreduceproject_spark curate \
        --input /path/documents.parquet --output /path/curated \
        --min-tokens 10 --max-tokens 1000 --threshold 0.8 --cap 40

and prints one JSON line with the per-stage survival funnel.

``profile`` runs the dataset-profiling surface over any parquet
dataset — per-file zone map, exact percentiles, and the pairwise
correlation matrix of the requested numeric columns::

    python -m osmapreduceproject_spark profile \
        --input /path/data.parquet --cols price,quantity,discount

and prints one JSON document with the three sections. ``quality`` runs
the pre-curation corpus audit (pipelines.quality_report — the q191-graded
delegate) and prints its gopher/C4/readability/length sections as JSON::

    python -m osmapreduceproject_spark quality --input /path/documents.parquet
"""

from __future__ import annotations

import argparse
import json
import sys


def _conf_cmd(args) -> int:
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


def _curate_cmd(args) -> int:
    from .pipelines import curate_corpus, curation_report
    from .session import get_spark

    spark = get_spark(app_name="curate", cpus=args.workers,
                      shuffle_partitions=args.workers)
    try:
        docs = spark.read.parquet(args.input)
        stages = curate_corpus(
            docs,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            languages=args.languages.split(",") if args.languages else None,
            near_dup_threshold=args.threshold,
            cap=args.cap,
            hash_family=args.hash_family,
        )
        report = curation_report(stages)
        stages[-1][1].write.mode("overwrite").parquet(args.output)
        print(json.dumps({"stages": report, "output": args.output}))
    finally:
        spark.stop()
    return 0


def _profile_cmd(args) -> int:
    from .operators.stats import corr_matrix, exact_percentile
    from .session import get_spark
    from .sources.io import parquet_zone_map

    spark = get_spark(app_name="profile", cpus=args.workers,
                      shuffle_partitions=args.workers)
    try:
        cols = [c for c in args.cols.split(",") if c]
        out: dict = {"input": args.input, "cols": cols}
        out["zone_map"] = [
            r.asDict() for r in parquet_zone_map(spark, args.input, cols).collect()
        ]
        ps = [float(x) for x in args.percentiles.split(",") if x]
        df = spark.read.parquet(args.input)
        out["percentiles"] = {
            c: dict(zip(ps, exact_percentile(df, c, ps))) for c in cols
        }
        if len(cols) > 1:
            out["correlations"] = [
                r.asDict() for r in corr_matrix(df, cols).collect()
            ]
        print(json.dumps(out, default=str))
    finally:
        spark.stop()
    return 0


def _quality_cmd(args) -> int:
    from .pipelines import quality_report
    from .session import get_spark

    spark = get_spark(app_name="quality", cpus=args.workers,
                      shuffle_partitions=args.workers)
    try:
        docs = spark.read.parquet(args.input)
        benchmark = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        sections = quality_report(docs, benchmark=benchmark)
        out = {
            "input": args.input,
            "sections": {
                name: [r.asDict() for r in frame.collect()]
                for name, frame in sections
            },
        }
        print(json.dumps(out, default=str))
    finally:
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m osmapreduceproject_spark")
    sub = p.add_subparsers(dest="which", required=True)

    for name in ("sort", "max"):
        sp = sub.add_parser(name, help=f"reference {name} program")
        sp.add_argument("--mode", choices=["thread", "proc"], default="thread",
                        help="accepted for reference CLI parity; both map to "
                             "local-mode executor threads")
        sp.add_argument("--workers", type=int, default=4,
                        help="parallelism (local[N])")
        sp.add_argument("--size", type=int, default=131072,
                        help="number of integers")
        sp.add_argument("--seed", type=int, default=42,
                        help="data-generation seed")
        sp.set_defaults(fn=_conf_cmd)

    cp = sub.add_parser("curate", help="end-to-end corpus curation pipeline")
    cp.add_argument("--input", required=True, help="documents parquet path")
    cp.add_argument("--output", required=True, help="curated parquet output dir")
    cp.add_argument("--workers", type=int, default=4, help="parallelism (local[N])")
    cp.add_argument("--min-tokens", type=int, default=10)
    cp.add_argument("--max-tokens", type=int, default=1000)
    cp.add_argument("--languages", default=None,
                    help="comma-separated lang codes to keep (default: all)")
    cp.add_argument("--threshold", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    cp.add_argument("--cap", type=int, default=None, help="max docs per source")
    cp.add_argument("--hash-family", choices=["xxhash64", "md5"],
                    default="xxhash64",
                    help="MinHash base hash (xxhash64 = production path)")
    cp.set_defaults(fn=_curate_cmd)

    pp = sub.add_parser("profile", help="dataset profiling report")
    pp.add_argument("--input", required=True, help="parquet dataset path")
    pp.add_argument("--cols", required=True,
                    help="comma-separated numeric columns to profile")
    pp.add_argument("--percentiles", default="0.01,0.25,0.5,0.75,0.99",
                    help="comma-separated percentiles for the exact quantiles")
    pp.add_argument("--workers", type=int, default=4, help="parallelism (local[N])")
    pp.set_defaults(fn=_profile_cmd)

    qp = sub.add_parser(
        "quality",
        help="corpus quality audit (pipelines.quality_report: gopher + C4 "
             "+ readability + length sections as one JSON document)",
    )
    qp.add_argument("--input", required=True, help="documents parquet path")
    qp.add_argument("--benchmark", default=None,
                    help="optional benchmark parquet for the contamination rule")
    qp.add_argument("--workers", type=int, default=4, help="parallelism (local[N])")
    qp.set_defaults(fn=_quality_cmd)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
