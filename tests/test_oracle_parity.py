"""The correctness gate, run locally: every catalog query with an oracle
must value-match DuckDB at sf0.01 — the same comparison the driver does."""

from __future__ import annotations

import pytest

from osmapreduceproject_spark.queries import QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_check import check_query

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    issues = check_query(spark, duck, name, SF_CORRECT)
    assert not issues, f"{name}: " + "; ".join(issues)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, duck, name):
    df = QUERIES[name].fn(spark, SF_CORRECT)
    assert df.count() >= 0
