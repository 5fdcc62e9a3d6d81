"""Stall watchdog (operator T9) and table discovery (S7).

Reference: ``WatchDog.java:13-61`` — a side thread interrupts the
streaming thread when no progress is made for ``max_journal_timeout``
(60 s default, As400ConnectorConfig.java:111-115). Spark analogue:
jobs run on the cluster, so the watchdog cancels the stalled *job
group* instead of interrupting a thread; the tailer's next iteration
resumes from the committed watermark (no state is lost — the fence
makes a cancelled batch a clean no-op).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession


class WatchDog:
    """Cancel a job group if it runs past ``timeout_sec``.

    Usage::

        with WatchDog(spark, "batch-7", timeout_sec=60):
            spark.sparkContext.setJobGroup("batch-7", "merge batch 7")
            ...actions...
    """

    def __init__(self, spark: SparkSession, group: str, timeout_sec: float):
        self.spark = spark
        self.group = group
        self.timeout_sec = timeout_sec
        self.fired = False
        self._timer: threading.Timer | None = None

    def _cancel(self):
        self.fired = True
        self.spark.sparkContext.cancelJobGroup(self.group)

    def __enter__(self):
        # interruptOnCancel: without it, cancellation only prevents
        # NEW tasks — running tasks would finish anyway (the
        # reference's WatchDog interrupts the thread for the same
        # reason, WatchDog.java:22-44)
        self.spark.sparkContext.setJobGroup(
            self.group, f"watchdog:{self.group}", interruptOnCancel=True
        )
        self._timer = threading.Timer(self.timeout_sec, self._cancel)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, *exc):
        if self._timer:
            self._timer.cancel()
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        return False  # propagate the cancellation exception


def list_captured_tables(cfg) -> tuple[str, ...]:
    """S7: table-list discovery. The reference asks the host catalog
    (``readTableNames``, As400SnapshotChangeEventSource.java:111-116);
    here the include list IS the catalog (a synthetic journal has one
    logical source); on a cluster this would be
    ``spark.catalog.listTables`` filtered by the include patterns."""
    return tuple(cfg.table_include_list)
