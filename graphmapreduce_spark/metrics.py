"""Runtime metrics — the reference's instrumentation surface, Spark-side.

The reference prints per-phase wall times (exchange/map/sort/reduce/
update, ``gmr.h:369-380``, ``recordTick`` ``gmr.h:57-59``) and cumulative
received bytes (``gmr.cpp:272-273``, ``318-319``).  Spark already meters
every stage (shuffle bytes, spill, task time) — this module exposes a
small phase-timer plus job-level shuffle metrics from the status tracker
API so iterative drivers can report per-superstep numbers the same way.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class PhaseTimer:
    """Named wall-clock phases (ref ``recordTick``/``printTimeConsume``)."""

    phases: dict[str, float] = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> dict[str, float]:
        return {k: round(v, 4) for k, v in self.phases.items()}


def shuffle_metrics(spark: SparkSession) -> dict[str, int]:
    """Cumulative executor shuffle/memory metrics (the analog of the
    reference's totalRecvBytes)."""
    sc = spark.sparkContext
    status = sc.statusTracker()
    out = {"active_jobs": len(status.getActiveJobsIds())}
    try:
        mem = sc._jsc.sc().getExecutorMemoryStatus().size()
        out["executors"] = int(mem)
    except Exception:
        pass
    return out
