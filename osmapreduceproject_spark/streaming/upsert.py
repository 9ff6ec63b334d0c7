"""Streaming CDC upsert sink: a compacted materialized view over a
change-log stream — the MERGE-INTO path when the target is plain parquet
rather than a lake-format table.

Batch half of the story: operators/windows.py ``compact_latest`` (q176)
turns a change log into current state. This module streams it: each
micro-batch of change rows merges into the current view and the result
replaces the view ATOMICALLY (versioned directory + pointer-file flip),
so readers always see a complete consistent snapshot and a crashed
writer leaves the previous view intact.

Exactly-once without a transaction log: the merge is IDEMPOTENT by
construction — max-version-wins compaction gives the same winners
whether a replayed batch is applied once or twice — so the standard
restart window (batch written, checkpoint not yet committed) cannot
corrupt the view. At 100 TB the per-batch cost is one key-partitioned
window over (current view ∪ batch); with a lake format the same
composition becomes MERGE INTO and pays only for touched files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def read_upsert_view(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Read the current materialized view (None before the first commit).
    The pointer file names the live version directory; the read is
    consistent regardless of concurrent sink progress."""
    ptr = os.path.join(out_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return spark.read.parquet(os.path.join(out_dir, name))


def stream_upsert_sink(
    stream_df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
):
    """Maintain a compacted materialized view of a change-log stream.

    Each micro-batch: current view ∪ batch rows → ``compact_latest``
    (one key-partitioned row_number — the q176 semantics exactly) →
    write ``view_v{batch_id}/`` → atomically flip the ``_CURRENT``
    pointer (os.replace). Delete handling is the caller's tombstone
    convention: tombstone rows win compaction like any upsert and the
    reader filters them (as q176 does) — the view itself stays a pure
    latest-version table.

    Replay-safe: a re-run batch merges into a view that already contains
    it; max-version compaction is idempotent, so the rewritten version
    directory is identical and the pointer flip is a no-op rename.
    """
    from ..operators.windows import compact_latest

    os.makedirs(out_dir, exist_ok=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = read_upsert_view(spark, out_dir)
        log = batch_df if cur is None else cur.unionByName(
            batch_df.select(*cur.columns)
        )
        merged = compact_latest(log, key_cols, version_col, tiebreak_col)
        name = f"view_v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        tmp = os.path.join(out_dir, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, os.path.join(out_dir, _POINTER))

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .start()
    )
