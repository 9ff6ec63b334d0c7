"""Custom stateful streaming operators (`applyInPandasWithState`) —
SURVEY.md §2.B streaming row, "custom stateful operators".

Where the built-in windowed aggregations don't fit (arbitrary per-key
state machines, running totals across the whole stream, custom eviction),
`applyInPandasWithState` gives a per-key state cell the engine checkpoints
and recovers. State lives in the state store: keep it O(1) per key —
aggregates, not row buffers — or the store becomes the bottleneck.

Closures are fully self-contained (imports inside) so workers never need
this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_totals_stateful(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, integer-cents sum) across the entire
    stream — the streaming generalization of the reference's shared-max
    reduce cell (`/root/reference/max_aggregation.cpp:47-63`): one small
    mutable state per key, updated per batch, no row history retained.

    Emits the updated totals for each key touched in a micro-batch
    (output mode: update). Integer cents keep the sum exact and
    order-independent, matching the engine's cross-engine float rules.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} string, n bigint, total_cents bigint"
    state_schema = "n bigint, total_cents bigint"

    def update_totals(key, pdf_iter, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int((pdf[value_col] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total_cents": [cents]})

    return df.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """State-v2 version of :func:`running_totals_stateful` on the
    ``transformWithStateInPandas`` API (Spark 4): typed value state,
    explicit processor lifecycle, RocksDB-backed store (the session must
    set ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider — required by this API, and the right store at scale anyway:
    state spills to disk instead of capping at executor heap).

    The processor class is defined inside this closure ON PURPOSE:
    cloudpickle then serializes it by value, so workers never import this
    package (same self-containment rule as the v1 operator).

    Runtime dependency: this API spawns a protobuf-based Python driver
    worker, so ``google.protobuf`` must be installed (its absence fails
    at query start, not import — the conformance test skips itself when
    the package is missing).
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n bigint, total_cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int((pdf[value_col] * 100).round().astype("int64").sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total_cents": [cents]}
            )

        def close(self):
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=f"{key_col} string, n bigint, total_cents bigint",
        outputMode="Update",
        timeMode="None",
    )
