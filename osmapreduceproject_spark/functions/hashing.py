"""Cross-engine deterministic hash family.

The engine's content hashes (dedup signatures, fingerprints, MinHash
seeds) are built on md5 — available identically in Spark and DuckDB — so
every hash-based operator stays oracle-checkable:

  Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

Both yield the same 60-bit non-negative integer. All functions here are
built-in Catalyst expressions (JVM-side, codegen'd) — no Python UDFs in
the hot path, so they vectorize at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits — fits BIGINT with no sign issues


def md5_int(col: Column) -> Column:
    """60-bit integer hash of a string column (cross-engine stable)."""
    return F.conv(F.substring(F.md5(col), 1, HEX_CHARS), 16, 10).cast("bigint")


def seeded_hash(col: Column, seed: int) -> Column:
    """Seeded variant: independent hash function per seed (MinHash family)."""
    return md5_int(F.concat(F.lit(f"{seed}:"), col))


def md5_int_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_int`."""
    return f"(('0x' || substr(md5({expr}), 1, {HEX_CHARS}))::BIGINT)"


def seeded_hash_sql(expr: str, seed: int) -> str:
    return md5_int_sql(f"'{seed}:' || {expr}")
