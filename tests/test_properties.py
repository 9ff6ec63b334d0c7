"""Property-based tests (hypothesis) — SURVEY.md §5.2 item 3.

Randomized small inputs through the real operators, invariants checked
against pandas oracles. Few examples per property (each runs a Spark
job); the fixed derandomized profile keeps CI deterministic.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-1000, max_value=1000)
rows = st.lists(st.tuples(keys, vals), min_size=1, max_size=40)


@given(data=rows)
@SET
def test_salted_join_equals_plain(spark, data):
    from osmapreduceproject_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)], "k bigint, v bigint, rid bigint"
    )
    right = left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    got = sorted(map(tuple, salted_join(left, right, on="k", salts=3, salt_src=["rid"]).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


@given(data=rows)
@SET
def test_exact_dedup_keeps_min_id(spark, data):
    from osmapreduceproject_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, f"text-{k}") for i, (k, _) in enumerate(data)], "doc_id bigint, text string"
    )
    out = exact_dedup(df).collect()
    pdf = pd.DataFrame([(i, f"text-{k}") for i, (k, _) in enumerate(data)],
                       columns=["doc_id", "text"])
    want = pdf.groupby("text")["doc_id"].min().to_dict()
    got = {r["text"]: r["doc_id"] for r in out}
    assert got == want


@given(
    ltimes=st.lists(st.integers(0, 100), min_size=1, max_size=20),
    rtimes=st.lists(st.integers(0, 100), min_size=1, max_size=20),
)
@SET
def test_asof_join_matches_pandas(spark, ltimes, rtimes):
    from osmapreduceproject_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(sorted(ltimes))], "k bigint, t bigint, lid bigint"
    )
    right = spark.createDataFrame(
        # distinct right timestamps: at equal ts the window picks the last
        # right row, pandas merge_asof the last in input order — dedup to
        # make the oracle well-defined
        [(1, t, 100 + t) for t in sorted(set(rtimes))], "k bigint, t bigint, payload bigint"
    )
    got = {
        (r["lid"]): r["payload_asof"]
        for r in asof_join(left, right, on="k", left_time="t", right_time="t",
                           right_cols=["payload"]).collect()
    }
    lp = pd.DataFrame({"t": sorted(ltimes), "lid": range(len(ltimes))})
    rp = pd.DataFrame({"t": sorted(set(rtimes))})
    rp["payload"] = 100 + rp["t"]
    merged = pd.merge_asof(lp, rp, on="t", direction="backward")
    want = {
        int(row.lid): (None if pd.isna(row.payload) else int(row.payload))
        for row in merged.itertuples()
    }
    assert got == want
