"""Phase timing + peak-memory metrics, parity with the reference's report.

Reference: phase stamps via ``chrono::high_resolution_clock``
(``/root/reference/parallel_sort.cpp:61,92,95,134,144-150``) and peak RSS
via ``getrusage(RUSAGE_SELF).ru_maxrss``
(``/root/reference/parallel_sort.cpp:15-19``). Here: wall-clock around
actions (map/reduce phases are stage boundaries inside one Spark job, so
the engine reports per-phase time when the caller splits phases, plus
total) and ``resource.getrusage`` on the driver.
"""

from __future__ import annotations

import resource
import time
from dataclasses import dataclass, field


def peak_rss_kb() -> int:
    """Peak RSS of this process in KB (ru_maxrss is KB on Linux)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


@dataclass
class PhaseTimer:
    """Accumulates named phase durations; prints a reference-style report.

    Reference output format: ``Map time: X ms / Reduce time: Y ms /
    Total: Z ms / Peak RSS: K KB`` (``parallel_sort.cpp:144-152``).
    """

    phases: dict = field(default_factory=dict)
    _start: dict = field(default_factory=dict)

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self.phases[name] = self.phases.get(name, 0.0) + dt
        return dt

    def time(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                timer.start(name)
                return timer

            def __exit__(self, *exc):
                timer.stop(name)
                return False

        return _Ctx()

    @property
    def total_ms(self) -> float:
        return sum(self.phases.values()) * 1000.0

    def report(self) -> dict:
        out = {f"{k}_ms": round(v * 1000.0, 3) for k, v in self.phases.items()}
        out["total_ms"] = round(self.total_ms, 3)
        out["peak_rss_kb"] = peak_rss_kb()
        return out

    def print_report(self) -> None:
        rep = self.report()
        for k, v in rep.items():
            if k.endswith("_ms"):
                print(f"{k[:-3].capitalize()} time: {v} ms")
        print(f"Peak RSS: {rep['peak_rss_kb']} KB")


def observed(df, *aggs, name: str = "engine"):
    """Attach named aggregate metrics to a DataFrame, collected as a side
    effect of whatever action runs it — the Spark-native version of the
    reference printing its result inline with its timing report
    (``max_aggregation.cpp:64-69``: ``Final max`` alongside ``Map time``).

    Returns ``(df, Observation)``; read ``observation.get`` after an
    action. Unlike a separate ``.agg().collect()``, this adds NO extra
    job/scan — at 100 TB that second pass is the difference between free
    telemetry and doubling the query.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *aggs), obs
