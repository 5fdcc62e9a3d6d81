"""F8 envelope projection, A1 lag metrics, S10 quarantine, T7
empty-range watermark advance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_journal,
    write_journal,
)
from debezium_connector_ibmi_spark.operators.envelope import to_change_envelope
from debezium_connector_ibmi_spark.operators.transactions import (
    event_counters,
    transaction_summary,
)
from debezium_connector_ibmi_spark.pipeline import decoded_events
from debezium_connector_ibmi_spark.streaming.engine import JournalTailer

GEN = JournalGenConfig(n_urls=30, n_ops=400, txn_size=20, receiver_rotation=80)


@pytest.fixture(scope="module")
def events(spark):
    cfg = EngineConfig()
    j = generate_journal(spark, GEN)
    ev = decoded_events(j, cfg).cache()
    ev.count()
    yield ev
    ev.unpersist()


def test_envelope_shape(spark, events):
    env = to_change_envelope(events)
    assert set(env.columns) == {"key", "before", "after", "source", "op", "ts_ms"}
    rows = env.collect()
    for r in rows:
        if r["op"] == "c":
            assert r["after"] is not None and r["after"]["html"] is not None
            assert r["before"] is None
        elif r["op"] == "d":
            assert r["after"] is None
        assert r["source"]["connector"] == "ibmi-spark"
        assert r["ts_ms"] > 0


def test_event_counters(spark, events):
    got = {r["op"]: r["n"] for r in event_counters(events).collect()}
    assert set(got) <= {"c", "u", "d"}
    assert got["c"] > 0 and got["u"] > 0


def test_transaction_summary(spark):
    cfg = EngineConfig()
    j = generate_journal(spark, GEN)
    from debezium_connector_ibmi_spark.functions.optype import op_type_col
    from debezium_connector_ibmi_spark.operators.filters import (
        apply_standard_filters,
    )

    tagged = apply_standard_filters(j, cfg).withColumn("op", op_type_col())
    tx = transaction_summary(tagged)
    rows = tx.collect()
    assert len(rows) == 20  # 400 ops / 20 per cycle
    assert all(r["saw_begin"] == 1 and r["saw_end"] == 1 for r in rows)
    assert all(r["event_count"] > 0 for r in rows)


def test_lag_metrics_and_heartbeat(spark, tmpdir_path):
    jpath = f"{tmpdir_path}/journal"
    write_journal(spark, GEN, jpath, num_files=2)
    cfg = EngineConfig(
        journal_path=jpath, target_path=f"{tmpdir_path}/t", num_buckets=4,
        max_entries_per_batch=1200,
    )
    t = JournalTailer(spark, cfg)
    t.run_to_head(max_batches=1)
    lag = t.lag_metrics().collect()
    assert any(r["behind"] > 0 for r in lag)  # not caught up yet
    t.run_to_head()
    lag2 = t.lag_metrics().collect()
    assert all(r["behind"] == 0 for r in lag2)


def test_quarantine_bad_rows(spark, tmpdir_path):
    """Inject row events with null after-image payload: they must land
    in the quarantine table, not the target."""
    jpath = f"{tmpdir_path}/journal"
    j = generate_journal(spark, GEN)
    # corrupt: null out html on some update rows
    corrupted = j.withColumn(
        "html",
        F.when(
            (F.col("entry_type") == "UP") & (F.pmod(F.col("seq"), F.lit(7)) == 0),
            F.lit(None).cast("binary"),
        ).otherwise(F.col("html")),
    )
    corrupted.write.mode("overwrite").partitionBy("receiver_idx").parquet(jpath)
    cfg = EngineConfig(
        journal_path=jpath,
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
        quarantine_enabled=True,
    )
    t = JournalTailer(spark, cfg)
    stats = t.run_to_head()
    n_q = sum(s.get("quarantined", 0) for s in stats)
    assert n_q > 0
    qdf = spark.read.parquet(f"{cfg.target_path}/_quarantine/batch_id=*")
    assert qdf.count() == n_q
    assert qdf.filter(F.col("html").isNotNull()).count() == 0


def test_empty_range_advances_watermark(spark, tmpdir_path):
    """T7: a range whose entries are all filtered still advances the
    watermark (CPF7062 semantics)."""
    jpath = f"{tmpdir_path}/journal"
    # journal where one receiver contains ONLY ignored-table rows
    j = generate_journal(spark, GEN)
    only_ignored = j.withColumn(
        "table_name",
        F.when(F.col("receiver_idx") == 1, F.lit("IGNORE")).otherwise(
            F.col("table_name")
        ),
    )
    only_ignored.write.mode("overwrite").partitionBy("receiver_idx").parquet(jpath)
    cfg = EngineConfig(
        journal_path=jpath,
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
        max_entries_per_batch=80 * 6,  # one receiver per batch
    )
    t = JournalTailer(spark, cfg)
    stats = t.run_to_head()
    head = j.agg(F.max(F.struct("receiver_idx", "seq")).alias("h")).first()["h"]
    assert t.target.watermark() == (head["receiver_idx"], head["seq"])
    # rerun: no-op
    assert JournalTailer(spark, cfg).run_to_head() == []