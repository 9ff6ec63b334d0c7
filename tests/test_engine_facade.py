"""Smoke tests for the public Engine facade (SURVEY.md §3.5) — the first
API a reference user touches. Everything else in the suite tests the
underlying functions; this pins the facade wiring itself: session reuse,
view registration, SQL over views, and the reference-parity methods."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmapreduceproject_spark.engine import Engine
from tests.conftest import SF_SMOKE


def test_engine_facade_end_to_end(spark):
    eng = Engine(spark=spark, sf_dir=SF_SMOKE)
    # view registration + table access
    assert set(eng.tables) >= {"orders", "lineitem", "events", "documents"}
    assert eng.table("orders") is eng.tables["orders"]
    # SQL over registered views matches the DataFrame count
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_sql == eng.table("orders").count() > 0

    # reference parity methods on a small deterministic frame
    df = spark.range(1000).select(
        (F.pmod(F.col("id") * 2654435761, F.lit(100003))).alias("value")
    )
    vals = [r["value"] for r in df.collect()]
    got_sorted = [r["value"] for r in eng.parallel_sort(df).collect()]
    assert got_sorted == sorted(vals)
    assert eng.max_aggregation(df).collect()[0]["max_value"] == max(vals)

    # map_reduce facade: map = filter evens, reduce = count
    out = eng.map_reduce(
        df,
        map_fn=lambda d: d.where(F.col("value") % 2 == 0),
        reduce_exprs=[F.count(F.lit(1)).alias("n")],
    ).collect()
    assert out[0]["n"] == sum(1 for v in vals if v % 2 == 0)


def test_curate_pipeline_stages_monotone(spark):
    """The curation funnel over the fixture: stage survivor counts are
    non-increasing, exact dedup removes the fixture's planted exact
    dups, and the curated frame keeps the documents schema."""
    from osmapreduceproject_spark.pipelines import curate_corpus, curation_report
    from osmapreduceproject_spark.plans.inspect import release_intermediates
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    stages = curate_corpus(docs, min_tokens=1, max_tokens=100000, cap=40)
    report = curation_report(stages)
    release_intermediates()
    names = [n for n, _ in report]
    assert names == ["input", "length_filter", "exact_dedup", "near_dedup", "source_cap"]
    counts = [c for _, c in report]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    n_exact_distinct = docs.select("text").distinct().count()
    assert dict(report)["exact_dedup"] == n_exact_distinct
    assert set(stages[-1][1].columns) == set(docs.columns)


def test_curation_report_releases_its_caches(spark):
    """VERDICT r12 #4: curation_report persists the exact_dedup /
    near_dedup stage frames across the six counts (so the clustering
    subtree evaluates once) and RELEASES them afterwards — the stage
    frames stay usable (degrade to recompute) and the intermediate
    registry returns to its pre-call depth."""
    from osmapreduceproject_spark.pipelines import curate_corpus, curation_report
    from osmapreduceproject_spark.plans.inspect import (
        intermediates_mark,
        release_intermediates,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    stages = curate_corpus(docs, min_tokens=1, max_tokens=100000, cap=40)
    mark = intermediates_mark()  # after the pipeline's own build caches
    report = curation_report(stages)
    assert intermediates_mark() == mark, "report leaked stage caches"
    # the stage frames survive the release — same counts on recompute
    assert stages[-1][1].count() == dict(report)["source_cap"]
    release_intermediates()


def test_curate_cli_end_to_end(tmp_path):
    """`python -m osmapreduceproject_spark curate` over the fixture:
    writes curated parquet and prints a JSON funnel report. Subprocess on
    purpose — the CLI owns (and stops) its own SparkSession."""
    import json as _json
    import subprocess
    import sys

    from tests.conftest import SF_SMOKE

    out_dir = str(tmp_path / "curated")
    proc = subprocess.run(
        [sys.executable, "-m", "osmapreduceproject_spark", "curate",
         "--input", f"{SF_SMOKE}/documents.parquet", "--output", out_dir,
         "--workers", "2", "--min-tokens", "1", "--max-tokens", "100000"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = _json.loads(proc.stdout.strip().splitlines()[-1])
    stages = dict((s, n) for s, n in rep["stages"])
    assert stages["input"] > 0 and stages["near_dedup"] <= stages["exact_dedup"]
    import glob

    assert glob.glob(f"{out_dir}/*.parquet") or glob.glob(f"{out_dir}/part-*")


def test_decontaminate_removes_planted_overlap(spark):
    """A benchmark doc copied verbatim into training must be detected
    and anti-joined out; unrelated training docs survive."""
    from pyspark.sql import Row

    from osmapreduceproject_spark.pipelines import decontaminate
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    bench = spark.createDataFrame(
        [Row(doc_id=900, text="the quick brown fox jumps over the lazy dog today")]
    )
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely unrelated training document about spark joins"),
            Row(doc_id=3, text="another unrelated training document about parquet files"),
        ]
    )
    clean, hits = decontaminate(train, bench, threshold=0.8)
    got_hits = {(r["corpus_id"], r["probe_id"]) for r in hits.collect()}
    kept = {r["doc_id"] for r in clean.collect()}
    release_intermediates()
    assert got_hits == {(1, 900)}
    assert kept == {2, 3}


def test_build_ann_index_consistent_with_balance(spark):
    """Postings and balance agree: every vector appears once, list sizes
    sum to the corpus, shares sum to ~1."""
    from osmapreduceproject_spark.pipelines import build_ann_index
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    postings, balance = build_ann_index(emb, n_centroids=8)
    n = emb.count()
    assert postings.count() == n
    rows = balance.collect()
    assert sum(r["list_size"] for r in rows) == n
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_split_corpus_partitions_exactly(spark):
    """The three splits are disjoint, cover the corpus, and reproduce
    bit-identically on a differently-partitioned input."""
    from osmapreduceproject_spark.pipelines import split_corpus
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    splits = split_corpus(docs)
    ids = {k: {r["doc_id"] for r in v.select("doc_id").collect()} for k, v in splits.items()}
    n = docs.count()
    assert sum(len(v) for v in ids.values()) == n
    assert len(ids["train"] | ids["val"] | ids["test"]) == n
    # partitioning-independence: same membership from a repartitioned input
    splits2 = split_corpus(docs.repartition(13))
    ids2 = {k: {r["doc_id"] for r in v.select("doc_id").collect()} for k, v in splits2.items()}
    assert ids == ids2
    # default weights: train is the large split
    assert len(ids["train"]) > len(ids["val"]) and len(ids["train"]) > len(ids["test"])


def test_profile_cli_end_to_end(tmp_path):
    """`python -m osmapreduceproject_spark profile` over the fixture:
    prints one JSON document with zone map, exact percentiles, and the
    correlation matrix. Subprocess on purpose — the CLI owns (and
    stops) its own SparkSession."""
    import json as _json
    import subprocess
    import sys

    from tests.conftest import SF_SMOKE

    proc = subprocess.run(
        [sys.executable, "-m", "osmapreduceproject_spark", "profile",
         "--input", f"{SF_SMOKE}/orders.parquet",
         "--cols", "o_totalprice,o_orderkey",
         "--percentiles", "0.5,0.9", "--workers", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    doc = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert doc["zone_map"] and doc["zone_map"][0]["n_rows"] > 0
    assert set(doc["percentiles"]) == {"o_totalprice", "o_orderkey"}
    assert len(doc["percentiles"]["o_totalprice"]) == 2
    assert len(doc["correlations"]) == 1


def test_quality_cli_end_to_end():
    """`python -m osmapreduceproject_spark quality` over the fixture:
    prints one JSON document with the gopher/readability/length
    sections (the q191-graded pipeline behind a CLI). Subprocess on
    purpose — the CLI owns (and stops) its own SparkSession."""
    import json as _json
    import subprocess
    import sys

    from tests.conftest import SF_SMOKE

    proc = subprocess.run(
        [sys.executable, "-m", "osmapreduceproject_spark", "quality",
         "--input", f"{SF_SMOKE}/documents.parquet", "--workers", "2"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    doc = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(doc["sections"]) == {
        "gopher_summary", "readability_by_source", "length_histogram"
    }
    gopher = {r["rule"]: r["n_docs"] for r in doc["sections"]["gopher_summary"]}
    assert sum(gopher.values()) >= gopher.get("__kept", 0) > 0
