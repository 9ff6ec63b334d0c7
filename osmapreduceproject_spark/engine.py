"""Engine facade — the three public entry points (SURVEY.md §3.5).

1. DataFrame builder: ``engine.read(...)`` → plain PySpark DataFrame chain
   (Catalyst-native; nothing wrapped, nothing hidden from the optimizer).
2. SQL: ``engine.sql("...")`` over registered fixture views.
3. MapReduce facade: ``engine.map_reduce(...)`` reproducing the
   reference's surface (``/root/reference/parallel_sort.cpp``,
   ``max_aggregation.cpp``) on DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import mapreduce as mr
from .session import get_spark, load_tables


class Engine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.tables: dict[str, DataFrame] = {}
        if sf_dir:
            self.register(sf_dir)

    def register(self, sf_dir: str) -> dict[str, DataFrame]:
        """Load + register all fixture tables as temp views."""
        self.tables = load_tables(self.spark, sf_dir)
        return self.tables

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def read_parquet(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    # MapReduce facade (reference parity)
    def map_reduce(self, df, map_fn, reduce_exprs=None, reduce_keys=None, workers=None):
        return mr.map_reduce(df, map_fn, reduce_exprs, reduce_keys, workers)

    def parallel_sort(self, df, col="value", workers=None):
        return mr.parallel_sort(df, col, workers)

    def max_aggregation(self, df, col="value", workers=None):
        return mr.max_aggregation(df, col, workers)

    def stop(self) -> None:
        self.spark.stop()
