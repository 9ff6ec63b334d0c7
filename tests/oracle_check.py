"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, sorts columns by name,
canonicalizes row order, and compares values — so every catalog query is
verified to hash-match *before* the driver grades it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions; empty = match."""
    issues: list[str] = []
    sp = canonicalize(spark_df.toPandas())
    oc = canonicalize(oracle_pdf)
    if list(sp.columns) != list(oc.columns):
        issues.append(f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}")
        return issues
    if len(sp) != len(oc):
        issues.append(f"row count differs: spark={len(sp)} oracle={len(oc)}")
        return issues
    # The driver's hash is type-sensitive: DuckDB SUM(int) returns HUGEINT
    # (→ object/float64 in pandas) while Spark returns bigint — equal
    # values, different hash. Flag kind-level dtype divergence locally so
    # that class of bug never reaches the driver. int widths are fine
    # (i/u normalize together); numeric vs object/float is not.
    for col in sp.columns:
        ka = sp[col].dtype.kind.replace("u", "i")
        kb = oc[col].dtype.kind.replace("u", "i")
        if ka != kb and {ka, kb} <= {"i", "f", "b", "O"}:
            issues.append(
                f"col {col}: dtype kind differs: spark={sp[col].dtype} "
                f"oracle={oc[col].dtype} (driver hash is type-sensitive)"
            )
    if issues:
        return issues
    for col in sp.columns:
        sv, ov = sp[col].tolist(), oc[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not _values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            issues.append(
                f"col {col}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={a!r} oracle={b!r}"
            )
    return issues


def check_query(spark, con, name: str, sf_dir: str) -> list[str]:
    from osmapreduceproject_spark.queries import QUERIES

    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        return [] if n >= 0 else [f"{name}: negative count?"]
    opdf = con.execute(spec.oracle).df()
    return compare(sdf, opdf)
