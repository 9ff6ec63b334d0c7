"""Custom sink connector: an exactly-once checksum manifest writer.

The reference verifies its own output inline (``Sorted OK`` —
``/root/reference/parallel_sort.cpp:137-142``); this sink generalizes that
idea to the connector layer with Spark's two-phase write protocol:

- each TASK writes nothing durable — it folds its partition into a
  ``(rows, sum-of-md5 mod 2^64)`` commit message (wrapping addition is
  order- and partition-independent, so the manifest is stable under any
  parallelism — and unlike XOR, a row occurring an even number of times
  does NOT cancel out, so duplicate-row corruptions stay detectable);
- the DRIVER's ``commit()`` aggregates all task messages and atomically
  publishes one JSON manifest (tmp file + rename). A failed/speculated
  task never contributes — exactly the task-commit/job-commit split that
  makes distributed writes atomic at 100 TB.

Usage::

    df.write.format("checksum_sink").option("path", out).mode("append").save()

Classes are defined inside the factory closure so cloudpickle ships them
by value (workers never import this package).
"""

from __future__ import annotations


def make_checksum_sink():
    """Build the DataSource class (closure-defined for pickling by value)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _Msg(WriterCommitMessage):
        rows: int
        fingerprint: int

    class _Writer(DataSourceWriter):
        def __init__(self, options, schema):
            self.path = options["path"]
            self.cols = [f.name for f in schema.fields]

        def write(self, iterator):
            import hashlib

            rows, fp = 0, 0
            for row in iterator:
                rows += 1
                canon = "\x1f".join(str(row[c]) for c in self.cols)
                h = hashlib.md5(canon.encode("utf-8")).digest()
                # Multiset hash: wrapping ADD, not XOR — commutative (so
                # order/partition-independent) but duplicate rows compound
                # instead of cancelling pairwise.
                fp = (fp + int.from_bytes(h[:8], "big")) % (1 << 64)
            return _Msg(rows=rows, fingerprint=fp)

        def commit(self, messages):
            import json
            import os

            manifest = {
                "rows": sum(m.rows for m in messages),
                "fingerprint": 0,
                "tasks": len(messages),
                "columns": self.cols,
            }
            for m in messages:
                manifest["fingerprint"] = (manifest["fingerprint"] + m.fingerprint) % (1 << 64)
            tmp = f"{self.path}.tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, self.path)  # atomic publish

        def abort(self, messages):
            pass  # nothing durable was written

    class ChecksumSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "checksum_sink"

        def writer(self, schema, overwrite):
            return _Writer(self.options, schema)

    return ChecksumSinkDataSource


def register_checksum_sink(spark) -> None:
    """Register ``format("checksum_sink")`` on this session (idempotent)."""
    spark.dataSource.register(make_checksum_sink())
