"""Round-4: Prometheus textfile export of the engine's metrics
(streaming/metrics_export.py) — the health/metrics serving analogue of
the reference's connector-health module + JMX streaming metrics bean
(As400StreamingChangeEventSourceMetrics.java:17-53)."""

from __future__ import annotations

import re

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    write_journal,
)
from debezium_connector_ibmi_spark.streaming.engine import JournalTailer
from debezium_connector_ibmi_spark.streaming.metrics_export import (
    prometheus_lines,
    write_textfile,
)

GEN = JournalGenConfig(n_urls=30, n_ops=300, txn_size=20, receiver_rotation=100)

# Prometheus text exposition: metric{labels} value | # HELP/TYPE lines
_LINE_RE = re.compile(
    r"^(# (HELP|TYPE) [a-z_]+ .+"
    r"|[a-z_]+(\{[a-z_]+=\"[^\"]*\"(,[a-z_]+=\"[^\"]*\")*\})? -?[0-9.e+-]+)$"
)


def test_prometheus_export(spark, tmpdir_path):
    cfg = EngineConfig(
        journal_path=f"{tmpdir_path}/j",
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
        max_entries_per_batch=600,
    )
    write_journal(spark, GEN, cfg.journal_path, num_files=2)
    tailer = JournalTailer(spark, cfg)
    stats = tailer.run_to_head()
    n_events = sum(s.get("events", 0) for s in stats)

    lines = prometheus_lines(tailer)
    for ln in lines:
        assert _LINE_RE.match(ln), ln
    metrics = {}
    for ln in lines:
        if ln.startswith("#"):
            continue
        name = ln.split("{")[0].split(" ")[0]
        metrics.setdefault(name, []).append(ln)

    def value(name):
        return float(metrics[name][0].rsplit(" ", 1)[1])

    assert value("cdc_events_seen_total") == n_events
    assert value("cdc_batches_total") == len(stats)
    wm = tailer.target.watermark()
    assert value("cdc_watermark_receiver_idx") == wm[0]
    assert value("cdc_watermark_seq") == wm[1]
    # per-receiver gauges carry labels and cover the lineage
    assert len(metrics["cdc_applied_seq"]) == len(tailer.target.lineage())
    # fully caught up: every receiver's behind gauge is 0
    behinds = [
        float(ln.rsplit(" ", 1)[1]) for ln in metrics["cdc_journal_behind"]
    ]
    assert behinds and all(b == 0 for b in behinds)

    # textfile collector pattern: atomic write, re-readable
    path = write_textfile(tailer)
    with open(path) as fh:
        assert fh.read().splitlines() == lines
    # driver-local mode skips the lag job but keeps everything else
    light = prometheus_lines(tailer, include_lag=False)
    assert not any(
        ln.startswith("cdc_journal_behind") for ln in light
    )
    assert any(ln.startswith("cdc_events_seen_total") for ln in light)
