"""Deterministic seeded data generation — the reference's only "scan".

Reference semantics (``/root/reference/parallel_sort.cpp:43-46``,
``/root/reference/max_aggregation.cpp:34-38``): seed an ``mt19937_64``,
mask each draw with ``& 0x7fffffff`` → N non-negative 31-bit ints.

We reproduce the *semantics* (seeded, deterministic, uniform 31-bit), not
the bit-exact C++ stream (SURVEY.md §1.2): generation is distributed via
``mapInPandas`` over ``spark.range`` using a counter-based hash
(splitmix64, public-domain finalizer), so value_i = f(seed, i) can be
computed by any partition without coordination and the dataset is
independent of partitioning — the property that lets the same code
generate 10^12 rows on a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MASK_31 = 0x7FFFFFFF
_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain, Steele et al.)."""
    x = x.astype(_U64)
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return x ^ (x >> _U64(31))


def _values_for_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    mixed = splitmix64(ids.astype(_U64) ^ splitmix64(np.full(len(ids), seed, dtype=_U64)))
    return (mixed & _U64(MASK_31)).astype(np.int64)


def seeded_ints(
    spark: SparkSession, n: int, seed: int, num_partitions: int | None = None
) -> DataFrame:
    """N deterministic uniform ints in ``[0, 2^31-1]`` as column ``value``.

    Deterministic w.r.t. (n, seed) and independent of partitioning, so the
    reference's ``--workers`` sweep (``/root/reference/README.md:46-47``)
    never changes the dataset. Fully vectorized per partition; no driver
    materialization.
    """

    # NOTE: the closure must be fully self-contained (no references to
    # module-level functions). cloudpickle serializes module-level names
    # by reference, and Spark's Python workers don't necessarily have
    # this package on their sys.path when the driver imports us from a
    # different working directory (e.g. via __spark_entry__).
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        u64 = np.uint64

        def mix(x):
            with np.errstate(over="ignore"):
                x = (x + u64(0x9E3779B97F4A7C15)).astype(u64)
                x = ((x ^ (x >> u64(30))) * u64(0xBF58476D1CE4E5B9)).astype(u64)
                x = ((x ^ (x >> u64(27))) * u64(0x94D049BB133111EB)).astype(u64)
                return x ^ (x >> u64(31))

        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(u64)
            seeds = np.full(len(ids), seed, dtype=u64)
            vals = (mix(ids ^ mix(seeds)) & u64(0x7FFFFFFF)).astype(np.int64)
            yield pd.DataFrame({"value": vals})

    if num_partitions is None:
        # Size partitions to the data (~256k rows each), not to the core
        # count: a 131k-row conformance run through 32 Python workers pays
        # 32 worker spin-ups twice (orderBy's range-bound sampling pass +
        # the real pass) for microseconds of numpy work — measured 12x
        # slower than one right-sized partition. Large n still fans out,
        # capped at 4x parallelism (AQE coalesces from there).
        par = spark.sparkContext.defaultParallelism
        num_partitions = max(1, min((n + 262143) // 262144, par * 4))
    return spark.range(n, numPartitions=num_partitions).mapInPandas(gen, schema="value long")


def seeded_ints_local(n: int, seed: int) -> list[int]:
    """Driver-side oracle for tests: same stream as :func:`seeded_ints`."""
    return _values_for_ids(np.arange(n, dtype=np.int64), seed).tolist()


_C0, _C1, _C2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
_M64, _M32 = 1 << 64, 1 << 32


def _mix_int(x: int) -> int:
    """Pure-int splitmix64 finalizer (same as :func:`splitmix64`)."""
    x = (x + _C0) % _M64
    x = ((x ^ (x >> 30)) * _C1) % _M64
    x = ((x ^ (x >> 27)) * _C2) % _M64
    return x ^ (x >> 31)


def _mulmod64_sql(x: str, c: int) -> str:
    """DuckDB SQL for ``(x * c) mod 2^64``. DuckDB UBIGINT arithmetic
    errors on overflow, so the multiply is done 32-bit-split in HUGEINT:
    ``x*c ≡ lo·clo + ((lo·chi + hi·clo) mod 2^32)·2^32  (mod 2^64)`` —
    every intermediate ≤ 2^65, well inside HUGEINT."""
    clo, chi = c % _M32, c // _M32
    a = f"(({x})::HUGEINT % 4294967296) * {clo}"
    b = f"(({x})::HUGEINT % 4294967296) * {chi}"
    d = f"(({x})::HUGEINT // 4294967296) * {clo}"
    return (
        f"(({a} + (({b} + {d}) % 4294967296) * 4294967296)"
        f" % 18446744073709551616::HUGEINT)::UBIGINT"
    )


def seeded_ints_sql(n: int, seed: int) -> str:
    """DuckDB SQL producing the exact :func:`seeded_ints` value stream —
    the cross-engine oracle for the conformance programs.

    splitmix64 in SQL: xor/shift on UBIGINT (bit-exact), add/multiply via
    HUGEINT mod 2^64 (:func:`_mulmod64_sql`). ``mix(seed)`` is a constant,
    precomputed here and embedded as a literal. Verified value-identical
    to :func:`seeded_ints_local` for n up to 10^6 in
    tests/test_conformance.py.
    """
    s = _mix_int(seed)
    return f"""
    WITH ids AS (SELECT i::UBIGINT AS id FROM generate_series(0, {n - 1}) t(i)),
    s1 AS (SELECT ((xor(id, {s}::UBIGINT)::HUGEINT + {_C0})
                   % 18446744073709551616::HUGEINT)::UBIGINT AS x FROM ids),
    s2 AS (SELECT {_mulmod64_sql('xor(x, x >> 30)', _C1)} AS x FROM s1),
    s3 AS (SELECT {_mulmod64_sql('xor(x, x >> 27)', _C2)} AS x FROM s2)
    SELECT (xor(x, x >> 31) & 2147483647::UBIGINT)::BIGINT AS value FROM s3
    """
