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
