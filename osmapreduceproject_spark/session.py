"""SparkSession factory for the engine.

The reference selects its parallelism with ``--workers N``
(``/root/reference/parallel_sort.cpp:30-39``); here the analogous knob is
``spark.sql.shuffle.partitions`` / ``spark.default.parallelism``, and the
optimizer (Catalyst + AQE) replaces the reference's static chunk planning
(``parallel_sort.cpp:62-67``).

Scale notes (100 TB design point):
- AQE is always on: runtime partition coalescing + skew-join splitting is
  what makes a static plan survive real data distributions.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a 1000-executor cluster it should be set to ~2-3x total cores (or
  left to AQE's ``coalescePartitions.initialPartitionNum``).
- Timezone pinned UTC so timestamp semantics are stable across engines
  (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "osmapreduceproject_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` maps to the reference's ``--workers`` flag semantics: it sets
    local-mode thread count and the default shuffle parallelism.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Default UTC; SPARK_GRAFT_TZ lets the hostile gates re-run any
        # pytest file under an exotic session zone (Australia/Eucla,
        # +8:45) without code changes — operators must be immune (pure
        # integer epoch arithmetic), and re-running the STAGED oracle
        # suites under it proves that a round before declaration.
        .config(
            "spark.sql.session.timeZone",
            os.environ.get("SPARK_GRAFT_TZ", "UTC"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Long-running-driver hygiene (a 100 TB driver runs for days; the
        # test session runs thousands of jobs): the SQL status listener
        # retains plan-graph strings for up to 1000 executions even with
        # the UI disabled — iterative operators (connected components,
        # k-means) generate large plans per round and can OOM the driver
        # heap on retention alone. Keep a small window; likewise bound
        # job/stage retention and run the ContextCleaner's periodic GC
        # often enough that shuffle/broadcast/checkpoint state from
        # finished iterations is actually released.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every fixture table from ``sf_dir`` and register temp views.

    Explicit-path parquet scans: Catalyst pushes filters/projections into
    the scan (check ``PushedFilters`` in ``df.explain``), so downstream
    operators automatically benefit from column pruning at 100 TB.
    """
    out = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":
                from .sources.io import read_events

                df = read_events(spark, sf_dir)
            else:
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
