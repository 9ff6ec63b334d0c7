"""Reference conformance tests (SURVEY.md §5.2 items 1, 3, 4).

Port of the reference's own verification machinery:
- the N=32 manual-check case (README.md:137-140)
- sortedness property scan (parallel_sort.cpp:137-142)
- max ∈ input / equals local oracle (max_aggregation.cpp semantics)
- --workers sweep invariance (README.md:46-47): results must not depend
  on partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmapreduceproject_spark.datagen import seeded_ints, seeded_ints_local
from osmapreduceproject_spark.mapreduce import (
    is_sorted,
    map_reduce,
    max_aggregation,
    parallel_sort,
    run_conformance,
)


def test_datagen_matches_local_oracle(spark):
    vals = [r.value for r in seeded_ints(spark, 1000, seed=12345).collect()]
    assert sorted(vals) == sorted(seeded_ints_local(1000, 12345))
    assert all(0 <= v <= 0x7FFFFFFF for v in vals)


@pytest.mark.parametrize("workers", [1, 2, 4, 8])
def test_datagen_partition_invariance(spark, workers):
    """--workers sweep (README.md:46-47): dataset independent of chunking."""
    vals = sorted(
        r.value for r in seeded_ints(spark, 512, seed=999, num_partitions=workers).collect()
    )
    assert vals == sorted(seeded_ints_local(512, 999))


def test_seeded_ints_sql_matches_local_oracle():
    """The DuckDB splitmix64 replica must be value-identical to the
    generator — this is what makes the conf queries fully oracle-checked
    by the driver instead of rows-only."""
    import duckdb

    from osmapreduceproject_spark.datagen import seeded_ints_sql

    con = duckdb.connect()
    for n, seed in [(32, 12345), (4096, 7), (131072, 12345)]:
        got = [r[0] for r in con.execute(seeded_ints_sql(n, seed)).fetchall()]
        assert got == seeded_ints_local(n, seed), (n, seed)
    con.close()


def test_sort_n32_manual_case(spark):
    """The reference's 'Input Size = 32' validation (README.md:137-140)."""
    out = [r.value for r in parallel_sort(seeded_ints(spark, 32, seed=12345)).collect()]
    assert out == sorted(seeded_ints_local(32, 12345))


def test_sort_large_and_property(spark):
    df = seeded_ints(spark, 131072, seed=12345, num_partitions=8).cache()
    out = parallel_sort(df)
    assert is_sorted(out)
    first = out.limit(1).collect()[0].value
    assert first == min(seeded_ints_local(131072, 12345))
    df.unpersist()


def test_is_sorted_rejects_unsorted(spark):
    """The verify scan must actually detect disorder — both within-run
    violations and overlapping partition bounds."""
    df = seeded_ints(spark, 4096, seed=3, num_partitions=4)  # unsorted draw
    assert is_sorted(df) is False
    assert is_sorted(parallel_sort(df)) is True
    # overlapping bounds: two sorted runs with interleaved ranges
    a = spark.range(0, 100).select(F.col("id").alias("value")).coalesce(1)
    b = spark.range(50, 150).select(F.col("id").alias("value")).coalesce(1)
    assert is_sorted(a.union(b)) is False


@pytest.mark.parametrize("workers", [1, 4])
def test_max_agg(spark, workers):
    df = seeded_ints(spark, 100_000, seed=999, num_partitions=workers)
    got = max_aggregation(df).collect()[0]["max_value"]
    assert got == max(seeded_ints_local(100_000, 999))


def test_map_reduce_facade(spark):
    """Generic facade: map = filter evens, reduce = sum — semantics match
    a local computation."""
    df = seeded_ints(spark, 10_000, seed=7)
    out = map_reduce(
        df,
        map_fn=lambda d: d.where(F.col("value") % 2 == 0),
        reduce_exprs=[F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")],
        workers=4,
    ).collect()[0]
    local = [v for v in seeded_ints_local(10_000, 7) if v % 2 == 0]
    assert out["total"] == sum(local)
    assert out["n"] == len(local)


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_SCALE"),
    reason="scale smoke: set SPARK_GRAFT_SCALE=1 (sorts 10M rows, ~1 min)",
)
def test_ranked_sort_scale_smoke(spark):
    """10M-row probe of the scale path: ranked_sort's positions must be a
    permutation of 1..N with per-partition sorted runs and non-overlapping
    bounds — evidence the plan (range shuffle + broadcast offsets, no
    single-partition funnel) behaves beyond fixture scale."""
    from pyspark.sql import functions as F

    from osmapreduceproject_spark.mapreduce import is_sorted, ranked_sort
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    n = 10_000_000
    df = seeded_ints(spark, n, seed=424242)
    ranked = ranked_sort(df.select("value"), [F.col("value").asc()], num_partitions=64)
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    ).collect()[0]
    assert (agg["n"], agg["lo"], agg["hi"], agg["nd"]) == (n, 1, n, n)
    assert is_sorted(ranked.orderBy("pos"), "value") is True
    release_intermediates()


def test_run_conformance_report(spark):
    """The reference's report format: phase times + RSS + verification."""
    rep = run_conformance(spark, 4096, seed=12345, which="sort", workers=4)
    assert rep["sorted_ok"] is True
    assert rep["total_ms"] > 0 and rep["peak_rss_kb"] > 0
    rep2 = run_conformance(spark, 4096, seed=999, which="max", workers=4)
    assert rep2["final_max"] == max(seeded_ints_local(4096, 999))


def test_cli_mirrors_reference_invocation():
    """`python -m osmapreduceproject_spark sort --mode thread --workers 2
    --size 4096` must run end-to-end and print the reference's report
    shape (README.md:30-56): Mode/workers/size header, per-phase ms,
    total, verification flag, peak RSS. Subprocess on purpose — the CLI
    owns (and stops) its own SparkSession."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "osmapreduceproject_spark", "sort",
         "--mode", "thread", "--workers", "2", "--size", "4096"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "Mode: thread, workers=2, size=4096" in out
    assert "Total time (ms):" in out
    assert "Sorted OK: yes" in out
    assert "Peak RSS (KB):" in out


def test_read_json_with_deadletter(spark, tmp_path):
    """Good lines parse against the schema; corrupt lines land intact in
    the dead-letter frame; counts partition the input exactly."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from osmapreduceproject_spark.sources.io import read_json_with_deadletter

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        'this is not json\n'
        '{"id": 2, "name": "b"}\n'
        '{"id": "NOT_A_NUMBER", "name": "c"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_json_with_deadletter(spark, str(p), schema)
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "a"), (2, "b")}
    bads = [r["raw_record"] for r in bad.collect()]
    assert len(bads) == 2 and any("not json" in b for b in bads)


def test_incremental_read_processes_only_the_delta(spark, tmp_path):
    """Three scheduler runs over a growing directory: each reads exactly
    the uncommitted files; an uncommitted (failed) run re-reads the same
    delta; after commit the next run sees only newer files."""
    from osmapreduceproject_spark.sources.io import incremental_read

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    import os

    os.makedirs(src)
    spark.range(5).write.mode("overwrite").parquet(f"{src}/_tmp1")
    # move part file in as a single stable name
    import glob
    import shutil

    def land(name, df):
        tmp = f"{src}/_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")
        shutil.rmtree(tmp)

    shutil.rmtree(f"{src}/_tmp1")
    land("f1", spark.range(0, 5))
    df1, commit1 = incremental_read(spark, src, state)
    assert df1.count() == 5
    # failure: commit never called → same delta again
    df1b, commit1b = incremental_read(spark, src, state)
    assert df1b.count() == 5
    commit1b()
    land("f2", spark.range(100, 103))
    df2, commit2 = incremental_read(spark, src, state)
    assert sorted(r["id"] for r in df2.collect()) == [100, 101, 102]
    commit2()
    df3, _ = incremental_read(spark, src, state)
    assert df3 is None


def test_read_csv_with_deadletter(spark, tmp_path):
    """CSV rows that fail the schema (bad casts) dead-letter intact;
    clean rows parse; the two frames partition the input."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from osmapreduceproject_spark.sources.io import read_csv_with_deadletter

    p = tmp_path / "in.csv"
    p.write_text("1,a\nxx,b\n2,c\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_csv_with_deadletter(spark, str(p), schema)
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "a"), (2, "c")}
    bads = [r["raw_record"] for r in bad.collect()]
    assert bads == ["xx,b"]


def test_read_parquet_merged_schema_evolution(spark, tmp_path):
    """Files written under an older, narrower schema surface NULLs in
    the later columns; the default (non-merged) read would pick one
    footer's schema arbitrarily."""
    from osmapreduceproject_spark.sources.io import read_parquet_merged

    old = spark.createDataFrame([(1, "a")], "id bigint, name string")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    )
    old.write.parquet(str(tmp_path / "d" / "old"))
    new.write.parquet(str(tmp_path / "d" / "new"))
    got = read_parquet_merged(spark, str(tmp_path / "d" / "*"))
    rows = {(r["id"], r["name"], r["score"]) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    assert set(got.columns) == {"id", "name", "score"}


def test_read_binary_files(spark, tmp_path):
    """binaryFile ingest: one row per file, exact bytes, glob filters
    before any bytes move."""
    from osmapreduceproject_spark.sources.io import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02")
    (tmp_path / "b.bin").write_bytes(b"payload")
    (tmp_path / "skip.txt").write_text("nope")
    got = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {
        (r["path"].rsplit("/", 1)[-1], bytes(r["content"]), r["length"])
        for r in got.collect()
    }
    assert rows == {("a.bin", b"\x00\x01\x02", 3), ("b.bin", b"payload", 7)}
