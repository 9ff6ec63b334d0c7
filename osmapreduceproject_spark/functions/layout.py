"""Data-layout functions: multi-dimensional clustering keys.

Z-ordering (Morton interleave) maps two join/filter dimensions onto one
integer whose ordering preserves locality in BOTH dimensions — the
lakehouse layout trick (Delta OPTIMIZE ZORDER, Iceberg sort orders)
that makes range-partitioned writes prunable by either column: sorting
or range-bucketing by the Morton key before ``write_partitioned`` keeps
rows that share either key prefix in the same files, so scans filtered
on either dimension skip most files.

Pure Catalyst bit arithmetic (shift/and/multiply-add) — codegen'd, no
UDF, replicable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two
    non-negative integer columns: result bit 2i is a's bit i, bit 2i+1
    is b's bit i. Monotone in each argument when the other is fixed."""
    key: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        key = key + abit * F.lit(1 << (2 * i)) + bbit * F.lit(1 << (2 * i + 1))
    return key


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB SQL text computing the same Morton key."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
