"""Bucket-count evolution (sinks/merge.py rescale_buckets): the
rewrite preserves state/fences/watermarks, future writers adopt the
committed count (a mismatched constructor can no longer mis-assign
buckets against stored data), and time travel across the rescale
still reads old versions correctly."""

from __future__ import annotations

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    write_journal,
)
from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget
from debezium_connector_ibmi_spark.streaming.engine import JournalTailer
from debezium_connector_ibmi_spark.testing import state_df_to_dict

GEN = JournalGenConfig(n_urls=60, n_ops=600, txn_size=25, receiver_rotation=150)


def _cfg(base, journal, **kw):
    return EngineConfig(
        journal_path=journal,
        target_path=f"{base}/target",
        num_buckets=4,
        max_entries_per_batch=400,
        **kw,
    )


def _tail_some(spark, tmpdir_path, max_batches=None):
    journal = f"{tmpdir_path}/journal"
    cfg = _cfg(tmpdir_path, journal)
    write_journal(spark, GEN, journal, num_files=4)
    tailer = JournalTailer(spark, cfg)
    tailer.run_to_head(max_batches=max_batches)
    return cfg, tailer


def test_rescale_preserves_state_and_metadata(spark, tmpdir_path):
    cfg, tailer = _tail_some(spark, tmpdir_path)
    t = tailer.target
    before = state_df_to_dict(t.read().drop("bucket"))
    wm, bid = t.watermark(), t.last_batch_id()
    pre_version = t._latest_version()

    res = t.rescale_buckets(16)
    assert res["rescaled"] and res["from_buckets"] == 4
    assert t.num_buckets == 16
    after = state_df_to_dict(t.read().drop("bucket"))
    assert after == before
    # fences/watermark untouched; rescale to same size is a no-op
    assert t.watermark() == wm and t.last_batch_id() == bid
    assert t.rescale_buckets(16) == {
        "rescaled": False, "reason": "already at size",
    }
    # data really is spread over >4 buckets now (on-disk layout)
    import os

    vdir = f"{t.path}/data/v={res['version']}"
    buckets = {
        int(d.split("=", 1)[1])
        for d in os.listdir(vdir)
        if d.startswith("bucket=")
    }
    assert len(buckets) > 4 and max(buckets) >= 4
    # time travel: the pre-rescale snapshot still reads (old layout)
    old = state_df_to_dict(t.read(version=pre_version).drop("bucket"))
    assert old == before


def test_writers_adopt_committed_bucket_count(spark, tmpdir_path):
    cfg, tailer = _tail_some(spark, tmpdir_path, max_batches=2)
    tailer.target.rescale_buckets(8)
    # a fresh constructor with a DIFFERENT count adopts the committed
    # one — the old behavior (trust the caller) read/merged under the
    # wrong modulus and silently missed rows
    t2 = KeyBucketedTarget(
        tailer.spark if hasattr(tailer, "spark") else spark,
        cfg.target_path, key=cfg.key_column, num_buckets=32,
    )
    assert t2.num_buckets == 8
    before = state_df_to_dict(t2.read().drop("bucket"))

    # the tailer keeps going through a NEW instance (crash/restart
    # shape) and converges to the same final state as an untouched run
    tailer2 = JournalTailer(spark, cfg)
    assert tailer2.target.num_buckets == 8
    tailer2.run_to_head()
    final = state_df_to_dict(tailer2.target.read().drop("bucket"))
    assert set(before) <= set(final) or len(final) >= len(before)

    ref_cfg = _cfg(f"{tmpdir_path}/ref", f"{tmpdir_path}/journal")
    ref = JournalTailer(spark, ref_cfg)
    ref.run_to_head()
    assert final == state_df_to_dict(ref.target.read().drop("bucket"))


def test_rescale_on_empty_target(spark, tmpdir_path):
    t = KeyBucketedTarget(spark, f"{tmpdir_path}/t", num_buckets=4)
    assert t.rescale_buckets(8) == {
        "rescaled": False, "reason": "empty target",
    }
    assert t.num_buckets == 8
