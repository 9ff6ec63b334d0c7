"""Self-tests for the oracle comparator — the r3 bench-flagger incident
(a guard silently parsing nothing and reporting success) applies equally
to compare(): 111 green parity params are only evidence if the
comparator actually rejects wrong results. Pure-pandas, no Spark."""

from __future__ import annotations

import math

import pandas as pd

from tests.oracle_check import _values_equal, canonicalize, compare


class _FakeSparkDF:
    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf.copy()


def _cmp(spark_pdf, oracle_pdf):
    return compare(_FakeSparkDF(spark_pdf), oracle_pdf)


def test_identical_frames_match():
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert _cmp(pdf, pdf.copy()) == []


def test_row_order_and_column_order_insensitive():
    sp = pd.DataFrame({"b": ["y", "x"], "a": [2, 1]})
    oc = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert _cmp(sp, oc) == []


def test_value_mismatch_detected():
    sp = pd.DataFrame({"a": [1, 2]})
    oc = pd.DataFrame({"a": [1, 3]})
    issues = _cmp(sp, oc)
    assert issues and "values differ" in issues[0]


def test_row_count_mismatch_detected():
    issues = _cmp(pd.DataFrame({"a": [1]}), pd.DataFrame({"a": [1, 1]}))
    assert issues and "row count" in issues[0]


def test_column_name_mismatch_detected():
    issues = _cmp(pd.DataFrame({"a": [1]}), pd.DataFrame({"b": [1]}))
    assert issues and "columns differ" in issues[0]


def test_dtype_kind_divergence_detected():
    # DuckDB HUGEINT arrives as object/float — the driver-hash trap the
    # comparator exists to catch locally.
    sp = pd.DataFrame({"a": pd.Series([1, 2], dtype="int64")})
    oc = pd.DataFrame({"a": pd.Series([1.0, 2.0], dtype="float64")})
    issues = _cmp(sp, oc)
    assert issues and "dtype" in issues[0]


def test_int_width_does_not_false_positive():
    sp = pd.DataFrame({"a": pd.Series([1, 2], dtype="int32")})
    oc = pd.DataFrame({"a": pd.Series([1, 2], dtype="int64")})
    assert _cmp(sp, oc) == []


def test_nan_equals_nan_and_none_equals_none():
    assert _values_equal(float("nan"), float("nan"))
    assert _values_equal(None, None)
    assert not _values_equal(float("nan"), 0.0)
    sp = pd.DataFrame({"a": [1.0, float("nan")]})
    oc = pd.DataFrame({"a": [1.0, float("nan")]})
    assert _cmp(sp, oc) == []


def test_canonicalize_sorts_na_first_consistently():
    pdf = pd.DataFrame({"a": [2.0, None, 1.0]})
    out = canonicalize(pdf)
    assert math.isnan(out["a"][0]) or out["a"][0] is None
