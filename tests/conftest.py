from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmapreduceproject_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# Single-sourced with the path-pinned oracles (q223): the package owns
# the driver-grade sf pin; the fixture root follows it.
from osmapreduceproject_spark.queries import DRIVER_GRADE_SF_DIR as SF_CORRECT  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_check import duckdb_conn

    con = duckdb_conn(SF_CORRECT)
    yield con
    con.close()
