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


def ewma_events_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Batch twin of :func:`ewma_stateful`: per-key EWMA over the
    EVENT sequence in (ts, id) order — one ordered-array fold with the
    integer micro-unit state of ``operators.windows.ewma`` (the
    grid-free variant: per-event smoothing, the contract a stream can
    maintain without a resample barrier). Emits the final state per
    key: (key, n_events, ewma)."""
    from pyspark.sql import functions as F

    rows = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("e"),
                    F.col(id_col).alias("i"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("__s")
    )
    folded = F.aggregate(
        F.col("__s"),
        F.struct(
            F.lit(0).cast("bigint").alias("n"), F.lit(0).cast("bigint").alias("eq")
        ),
        lambda acc, x: F.struct(
            (acc["n"] + 1).alias("n"),
            F.when(
                acc["n"] == 0, F.round(x["v"] * 1_000_000).cast("bigint")
            )
            .otherwise(
                F.round(
                    F.lit(alpha) * F.round(x["v"] * 1_000_000)
                    + F.lit(1.0 - alpha) * acc["eq"]
                ).cast("bigint")
            )
            .alias("eq"),
        ),
    )
    return rows.select(
        F.col(key_col),
        folded["n"].alias("n_events"),
        (folded["eq"] / 1_000_000.0).alias("ewma"),
    )


def ewma_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Streaming per-key EWMA with ONE integer state cell per key —
    the alerting baseline maintained incrementally (the reference's
    shared reduce cell, max_aggregation.cpp:47-63, with exponential
    decay instead of max): rows sort by (event time, id) within each
    micro-batch and fold into the quantized integer state that
    replays bit-identically (the operators.windows.ewma recurrence),
    so stream-after-N-batches equals the batch fold over the same
    prefix WHEN batches arrive in event-time order (the file-source
    replay contract; out-of-order arrivals update state in arrival
    order — document feed ordering or pre-sort upstream). Output mode
    update: (key, n_events, ewma) per touched key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} bigint, n_events bigint, ewma double"
    state_schema = "n bigint, eq bigint"
    a, b = float(alpha), 1.0 - float(alpha)  # captured by value in the closure

    def update(key, pdf_iter, state):
        import math

        import pandas as pd

        def rnd(x):
            # ties away from zero — Spark/DuckDB round semantics, NOT
            # Python's half-to-even builtin
            return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

        n, eq = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, id_col])
            for v in pdf[value_col].astype(float):
                vq = rnd(v * 1_000_000)
                eq = vq if n == 0 else rnd(a * vq + b * eq)
                n += 1
        state.update((n, eq))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "ewma": [eq / 1_000_000.0]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
