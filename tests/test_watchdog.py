"""T9: watchdog cancels a stalled batch; the engine resumes cleanly."""

from __future__ import annotations

import pytest

from debezium_connector_ibmi_spark.streaming.watchdog import (
    WatchDog,
    list_captured_tables,
)


def test_watchdog_cancels_stalled_job(spark):
    from pyspark.sql import functions as F

    big = spark.range(1_000_000_000)
    slow = big.crossJoin(spark.range(1000)).agg(F.count(F.lit(1)))
    wd = WatchDog(spark, "wd-test", timeout_sec=3)
    with pytest.raises(Exception) as exc_info:
        with wd:
            slow.collect()
    assert wd.fired
    assert "cancel" in str(exc_info.value).lower()


def test_watchdog_noop_on_fast_job(spark):
    wd = WatchDog(spark, "wd-fast", timeout_sec=30)
    with wd:
        n = spark.range(10).count()
    assert n == 10
    assert not wd.fired


def test_list_captured_tables():
    from debezium_connector_ibmi_spark.config import EngineConfig

    assert list_captured_tables(EngineConfig()) == ("PAGES",)