"""Fixture schema drift guard.

The driver regenerates /root/testdata between rounds and has already
changed physical layouts once (events.ts went TIMESTAMP(NANOS) →
TIMESTAMP(MICROS), which silently compressed every Spark-side event
time 1000× until sources/io.py learned to sniff the unit). This test
pins every table's column names and logical types via a footer-only
pyarrow read, so the NEXT drift fails here — one obvious assertion at
the top of the suite — instead of as value mismatches scattered through
the oracle-parity params.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_CORRECT

# (table, {column: allowed pyarrow type strings}) — a set per column where
# the engine adapts to more than one physical layout.
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32"}, "n_name": {"string", "large_string"},
               "n_regionkey": {"int32"}},
    "customer": {"c_custkey": {"int64"}, "c_nationkey": {"int32"},
                 "c_acctbal": {"double"},
                 "c_mktsegment": {"string", "large_string"}},
    "supplier": {"s_suppkey": {"int64"}, "s_nationkey": {"int32"},
                 "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_retailprice": {"double"},
             "p_brand": {"string", "large_string"}, "p_size": {"int32"}},
    "orders": {"o_orderkey": {"int64"}, "o_custkey": {"int64"},
               "o_totalprice": {"double"},
               "o_orderdate": {"timestamp[us]", "date32[day]"}},
    "lineitem": {"l_orderkey": {"int64"}, "l_partkey": {"int64"},
                 "l_suppkey": {"int64"}, "l_linenumber": {"int32"},
                 "l_quantity": {"double"}, "l_extendedprice": {"double"},
                 "l_discount": {"double"}, "l_tax": {"double"},
                 "l_shipdate": {"timestamp[us]", "date32[day]"}},
    # ts: the two layouts read_events knows how to normalize. Anything
    # else (string, int64 epoch, timestamp with tz) needs new reader code.
    "events": {"event_id": {"int64"}, "ts": {"timestamp[us]", "timestamp[ns]"},
               "user_id": {"int64"}, "event_type": {"string", "large_string"},
               "value": {"double"}, "props": {"string", "large_string"}},
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"},
                  "lang": {"string", "large_string"},
                  "source": {"string", "large_string"}, "n_chars": {"int64"}},
    "embeddings": {"vec_id": {"int64"},
                   "embedding": {"list<element: float>", "list<item: float>"}},
}


def test_events_ts_unit_sniffer_rejects_unknown_layouts(tmp_path):
    """ADVICE r4: a drift to timestamp[ms] must fail fast in the READER,
    not only in the schema pin above — defaulting to the µs path would
    silently mis-scale every event time 1000×."""
    import pyarrow as pa

    from osmapreduceproject_spark.sources.io import _events_ts_unit

    for unit in ("us", "ns"):
        t = pa.table({"ts": pa.array([1, 2], type=pa.timestamp(unit))})
        pq.write_table(t, tmp_path / f"{unit}.parquet")
        assert _events_ts_unit(str(tmp_path / f"{unit}.parquet")) == unit
    for bad in (pa.timestamp("ms"), pa.timestamp("s"), pa.int64()):
        t = pa.table({"ts": pa.array([1, 2], type=bad)})
        pq.write_table(t, tmp_path / "bad.parquet")
        with pytest.raises(ValueError, match="unsupported physical type"):
            _events_ts_unit(str(tmp_path / "bad.parquet"))


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(table):
    schema = pq.read_schema(f"{SF_CORRECT}/{table}.parquet")
    names = set(schema.names)
    for col, allowed in EXPECTED[table].items():
        assert col in names, f"{table}: column {col} missing (have {schema.names})"
        got = str(schema.field(col).type)
        assert got in allowed, (
            f"{table}.{col}: physical type drifted to {got!r} "
            f"(engine handles {sorted(allowed)}); update readers AND this pin"
        )
