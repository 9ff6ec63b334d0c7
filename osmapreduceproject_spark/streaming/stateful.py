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
