"""The reference's seeded generator as a first-class Spark connector.

Reference semantics (``/root/reference/parallel_sort.cpp:43-46``,
``/root/reference/max_aggregation.cpp:34-38``): a seeded RNG stream masked
to 31 bits is the programs' only input "scan". :mod:`..datagen` provides
it as a ``mapInPandas`` transform; this module provides the same stream as
a Spark 4 **Python data source** — ``spark.read.format("seeded_ints")
.option("n", N).option("seed", S).load()`` — so it composes like any other
source (schema, partition planning, and Arrow-batched reads owned by the
connector, not the caller).

Partition planning mirrors the reference's uniform chunking
(``parallel_sort.cpp:62-67``): contiguous ``[start, end)`` id ranges, one
per input partition, each generated independently via the counter-based
splitmix64 hash — value_i = f(seed, i), no coordination, any scale.

Every class is defined inside the factory closure so cloudpickle ships it
by VALUE: executors never need this package importable (same
self-containment rule as every UDF closure in this engine).
"""

from __future__ import annotations


def make_seeded_ints_source():
    """Build the DataSource class (closure-defined for pickling by value)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    def _values(start: int, end: int, seed: int):
        import numpy as np

        u64 = np.uint64

        def mix(x):
            with np.errstate(over="ignore"):
                x = (x + u64(0x9E3779B97F4A7C15)).astype(u64)
                x = ((x ^ (x >> u64(30))) * u64(0xBF58476D1CE4E5B9)).astype(u64)
                x = ((x ^ (x >> u64(27))) * u64(0x94D049BB133111EB)).astype(u64)
                return x ^ (x >> u64(31))

        ids = np.arange(start, end, dtype=np.int64).astype(u64)
        seeds = np.full(len(ids), seed, dtype=u64)
        return ids.astype(np.int64), (mix(ids ^ mix(seeds)) & u64(0x7FFFFFFF)).astype(
            np.int64
        )

    class _Range(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 131072))
            self.seed = int(options.get("seed", 12345))
            self.fixed_partitions = int(options.get("numpartitions", 0))
            self.lo, self.hi = 0, self.n  # narrowed by pushFilters

        def partitions(self):
            span = max(0, self.hi - self.lo)
            num = self.fixed_partitions or max(1, min((span + 262143) // 262144, 128))
            per = (span + num - 1) // num if span else 1
            return [
                _Range(self.lo + i * per, min(self.lo + (i + 1) * per, self.hi))
                for i in range(num)
                if self.lo + i * per < self.hi
            ] or [_Range(0, 0)]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            u64 = np.uint64

            def mix(x):
                with np.errstate(over="ignore"):
                    x = (x + u64(0x9E3779B97F4A7C15)).astype(u64)
                    x = ((x ^ (x >> u64(30))) * u64(0xBF58476D1CE4E5B9)).astype(u64)
                    x = ((x ^ (x >> u64(27))) * u64(0x94D049BB133111EB)).astype(u64)
                    return x ^ (x >> u64(31))

            ids = np.arange(partition.start, partition.end, dtype=np.int64).astype(u64)
            seeds = np.full(len(ids), self.seed, dtype=u64)
            vals = (mix(ids ^ mix(seeds)) & u64(0x7FFFFFFF)).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids.astype(np.int64)), pa.array(vals)], names=["id", "value"]
            )

    class _PushdownReader(_Reader):
        """Reader with ``id``-range filter pushdown folded into partition
        PLANNING: pruned ids are never generated, so a point/range lookup
        over a 10^12-row synthetic table plans O(range) tasks, not O(n).
        Value predicates can't be inverted through the hash and stay with
        Spark. Kept as a subclass because merely overriding
        ``pushFilters`` makes Spark refuse the read unless
        ``spark.sql.python.filterPushdown.enabled`` is true — the
        DataSource picks the reader to match the session conf.
        """

        def pushFilters(self, filters):
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )

            remaining = []
            for f in filters:
                attr = getattr(f, "attribute", None)
                col = attr[0] if isinstance(attr, tuple) and len(attr) == 1 else attr
                v = getattr(f, "value", None)
                if col == "id" and isinstance(v, int):
                    if isinstance(f, GreaterThan):
                        self.lo = max(self.lo, v + 1)
                    elif isinstance(f, GreaterThanOrEqual):
                        self.lo = max(self.lo, v)
                    elif isinstance(f, LessThan):
                        self.hi = min(self.hi, v)
                    elif isinstance(f, LessThanOrEqual):
                        self.hi = min(self.hi, v + 1)
                    elif isinstance(f, EqualTo):
                        self.lo = max(self.lo, v)
                        self.hi = min(self.hi, v + 1)
                    else:
                        remaining.append(f)
                else:
                    remaining.append(f)
            return remaining

    class _StreamReader(SimpleDataSourceStreamReader):
        """Micro-batch stream over the same counter-hash value stream.

        The offset is just the next row id, so any offset range
        regenerates bit-identically — replay after failure is exact by
        construction (the property file/Kafka sources need a log for,
        a counter-based generator gets free).
        """

        def __init__(self, options):
            self.seed = int(options.get("seed", 12345))
            self.rows_per_batch = int(options.get("rowsperbatch", 10000))
            self.n = int(options.get("n", 0))  # 0 → unbounded

        def initialOffset(self):
            return {"i": 0}

        def _rows(self, start: int, end: int):
            ids, vals = _values(start, end, self.seed)
            return iter(zip(ids.tolist(), vals.tolist()))

        def read(self, start):
            i = start["i"]
            end = i + self.rows_per_batch
            if self.n:
                end = min(end, self.n)
            return self._rows(i, end), {"i": end}

        def readBetweenOffsets(self, start, end):
            return self._rows(start["i"], end["i"])

    class SeededIntsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "seeded_ints"

        def schema(self) -> str:
            return "id bigint, value bigint"

        def reader(self, schema):
            # Opt-in via .option("pushdown", "true"): planning runs in a
            # session-less Python subprocess, so the session conf can't
            # be probed here — and a pushFilters-capable reader is a hard
            # error unless spark.sql.python.filterPushdown.enabled is
            # also set on the session (pair the two).
            enabled = str(self.options.get("pushdown", "false")).lower() == "true"
            return (_PushdownReader if enabled else _Reader)(self.options)

        def simpleStreamReader(self, schema):
            return _StreamReader(self.options)

    return SeededIntsDataSource


def register_seeded_source(spark) -> None:
    """Register ``format("seeded_ints")`` on this session (idempotent)."""
    spark.dataSource.register(make_seeded_ints_source())
