"""User-defined-function surface: every flavor Spark offers, with guidance.

SURVEY.md §2.B row "UDF surface": scalar Python UDF, Arrow-batched pandas
UDF, grouped-map (`applyInPandas`), grouped-agg pandas UDAF, and a UDTF.

Performance doctrine (the 100 TB view):
- Built-in `pyspark.sql.functions` always win — they run JVM-side inside
  whole-stage codegen. Everything here exists for semantics Spark can't
  express natively, or as a conformance demonstration of the API surface.
- Pandas UDFs move data Python-side in Arrow record batches
  (`spark.sql.execution.arrow.maxRecordsPerBatch`, default 10k rows) —
  ~10-100x faster than row-at-a-time `F.udf`, which pickles every row.
- Grouped-map `applyInPandas` shuffles the full group to one task: groups
  must fit in executor memory. For skewed group sizes, pre-split with a
  salt or use window functions instead.
- All closures are self-contained (imports inside the function) so they
  pickle cleanly to executors regardless of the driver's cwd.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType


# ---------------------------------------------------------------------------
# 1. Row-at-a-time scalar UDF — the documented SLOW path (demo only)
# ---------------------------------------------------------------------------

@F.udf(returnType=StringType())
def py_reverse(s: str) -> str | None:
    """Row-at-a-time Python UDF (pickled per row — never use in a hot path;
    `F.reverse` is the real implementation). Kept as the §2.B conformance
    sample of the classic UDF API."""
    return None if s is None else s[::-1]


# ---------------------------------------------------------------------------
# 2. Arrow-batched scalar pandas UDF
# ---------------------------------------------------------------------------

@F.pandas_udf(IntegerType())
def token_count_pudf(texts: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch.

    Integer output → bit-stable across engines (oracle-checkable).
    """
    import re

    ws = re.compile(r"\s+")

    def count(t):
        if t is None:
            return None
        t = t.strip()
        return 0 if not t else len(ws.split(t))

    return texts.map(count).astype("Int32")


# ---------------------------------------------------------------------------
# 3. Grouped-map: applyInPandas
# ---------------------------------------------------------------------------

def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    out_col: str = "rnk",
) -> DataFrame:
    """Per-group dense positional rank via `applyInPandas`.

    Semantically ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, tb) — the
    window form is what production code should use (stays JVM-side); this
    exists to exercise the grouped-map surface with a deterministic,
    integer-valued, oracle-checkable computation. Each group is shuffled
    to a single task and materialized as one pandas DataFrame.
    """
    schema = f"{group_col} string, {order_col} double, {tiebreak_col} bigint, {out_col} bigint"

    g, v, tb, out = group_col, order_col, tiebreak_col, out_col

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([v, tb]).reset_index(drop=True)
        pdf[out] = range(1, len(pdf) + 1)
        return pdf[[g, v, tb, out]]

    return df.select(g, v, tb).groupBy(g).applyInPandas(rank_group, schema=schema)


# ---------------------------------------------------------------------------
# 4. Grouped-agg pandas UDAF
# ---------------------------------------------------------------------------

@F.pandas_udf(LongType())
def cents_sum_udaf(qty: pd.Series) -> int:
    """Exact sum of a 2-decimal column in integer cents (pandas UDAF).

    Rounds each value to cents first so the int64 sum is exact and
    order-independent — the same decimal-exactness rule the built-in
    queries use (queries.py module docstring).
    """
    return int((qty * 100).round().astype("int64").sum())


# ---------------------------------------------------------------------------
# 5. UDTF — table function emitting multiple rows per input row
# ---------------------------------------------------------------------------

def register_udtfs(spark) -> None:
    """Register the engine's UDTFs on a session.

    `word_positions(doc_id, text)`: explode text into (doc_id, pos, token)
    rows, invoked with a SQL LATERAL join. The Python-side split is
    `re.split(r'\\s+', text.strip())`, matching DuckDB's
    `regexp_split_to_array(trim(text), '\\s+')`.

    The handler class is defined *inside* this function: cloudpickle
    serializes locally-defined classes by value, so workers never need
    this package importable (the driver may run from any cwd).
    """
    from pyspark.sql.functions import udtf

    class WordPositions:
        def eval(self, doc_id: int, text: str):
            import re

            if text is None:
                return
            t = text.strip()
            if not t:
                return
            for pos, token in enumerate(re.split(r"\s+", t)):
                yield doc_id, pos, token

    word_positions = udtf(WordPositions, returnType="doc_id bigint, pos int, token string")
    spark.udtf.register("word_positions", word_positions)
