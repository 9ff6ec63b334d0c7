"""Physical-plan discipline tests — the 100 TB design enforced as
assertions: pushdown reaches the scan, projections prune columns, small
dims broadcast, rank filters become group limits, partial aggregation
happens before the exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmapreduceproject_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
)
from osmapreduceproject_spark.queries import QUERIES
from tests.conftest import SF_CORRECT


def test_filter_pushdown_q04(spark):
    df = QUERIES["q04_filter_project"].fn(spark, SF_CORRECT)
    assert has_pushed_filters(df, "l_quantity"), explain_str(df)


def test_column_pruning_q04(spark):
    df = QUERIES["q04_filter_project"].fn(spark, SF_CORRECT)
    cols = set(scan_read_schema(df))
    # 11-column table; the scan must read only what the query needs.
    assert "l_returnflag" not in cols and "l_tax" not in cols, cols
    assert {"l_orderkey", "l_quantity", "l_extendedprice"} <= cols


def test_broadcast_dims_q05(spark):
    df = QUERIES["q05_region_revenue"].fn(spark, SF_CORRECT)
    assert has_broadcast_join(df), explain_str(df)


def test_partial_aggregation_q01(spark):
    plan = explain_str(QUERIES["q01_pricing_summary"].fn(spark, SF_CORRECT))
    # Combiner pattern (max_aggregation.cpp M3→M4): partial agg before the
    # exchange, final after.
    assert "partial" in plan.lower(), plan


def test_topk_group_limit_q21(spark):
    plan = explain_str(QUERIES["q21_topk_per_group"].fn(spark, SF_CORRECT))
    assert "WindowGroupLimit" in plan, plan


def test_top10_is_take_ordered_q03(spark):
    plan = explain_str(QUERIES["q03_top_revenue_orders"].fn(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_anti_join_types(spark):
    semi = explain_str(QUERIES["q07_semi_join"].fn(spark, SF_CORRECT))
    anti = explain_str(QUERIES["q08_anti_join"].fn(spark, SF_CORRECT))
    assert "Semi" in semi, semi
    assert "Anti" in anti, anti


def test_no_python_udf_in_relational_core(spark):
    """The relational catalog must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — UDFs are reserved for the explicitly
    Python-bound operators (datagen, multimodal)."""
    for name in [
        "q01_pricing_summary",
        "q05_region_revenue",
        "q09_window_funcs",
        "q21_topk_per_group",
        "q31_minhash_lsh_pairs",
        "q34_cosine_topk",
    ]:
        plan = explain_str(QUERIES[name].fn(spark, SF_CORRECT))
        assert "EvalPython" not in plan, f"{name} fell off the JVM path:\n{plan}"


def test_asof_join_single_shuffle(spark):
    """The as-of join must not plan a nested-loop/cartesian join — it is
    a union + window, i.e. one hash exchange on the key."""
    plan = explain_str(QUERIES["q24_asof_join"].fn(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
