"""DBLog-style chunked incremental snapshot (sources/incremental.py):
stream-concurrent chunk merges converge to the fold oracle, completed
chunks are fenced (crash/re-run skips them), and the snapshotter and
tailer cannot replay-skip each other across fence domains."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_pages,
    write_journal,
)
from debezium_connector_ibmi_spark.sources.incremental import (
    INCREMENTAL_WRITER_ID,
    IncrementalSnapshotter,
)
from debezium_connector_ibmi_spark.streaming.engine import JournalTailer
from debezium_connector_ibmi_spark.testing import naive_replay, state_df_to_dict

GEN = JournalGenConfig(n_urls=50, n_ops=500, txn_size=25, receiver_rotation=120)


def _cfg(base, journal):
    return EngineConfig(
        journal_path=journal,
        target_path=f"{base}/target",
        checkpoint_path=f"{base}/ckpt",
        num_buckets=4,
        max_entries_per_batch=300,
    )


def _pages_state_dict(spark, pages_df):
    import pandas as pd

    from debezium_connector_ibmi_spark.functions.decode import extract_text_pd

    rows = [r.asDict() for r in pages_df.collect()]
    texts = extract_text_pd(
        pd.Series([r["html"] for r in rows], dtype="object")
    )
    return {
        r["url"]: {
            "url": r["url"],
            "warc_ts": r["warc_ts"],
            "html": bytes(r["html"]),
            "lang": r["lang"],
            "text": t,
        }
        for r, t in zip(rows, texts)
    }


def test_chunks_partition_the_table(spark, tmpdir_path):
    cfg = _cfg(tmpdir_path, f"{tmpdir_path}/journal")
    pages = generate_pages(spark, GEN).drop("version")
    snap = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4)
    sizes = [snap._chunk_df(i).count() for i in range(4)]
    assert sum(sizes) == pages.count()
    assert all(s > 0 for s in sizes)  # hash chunks are roughly even
    assert snap.pending_chunks() == [0, 1, 2, 3]


def test_interleaved_backfill_matches_fold_oracle(spark, tmpdir_path):
    """Chunked snapshot interleaved with live tailing converges to
    fold(pages, journal): every stale chunk row loses by position to
    journal events the stream already applied, and chunk rows for
    untouched keys land — no DBLog event-buffering needed."""
    journal = f"{tmpdir_path}/journal"
    cfg = _cfg(tmpdir_path, journal)
    pages = generate_pages(spark, GEN).drop("version")
    write_journal(spark, GEN, journal, num_files=4)

    tailer = JournalTailer(spark, cfg)
    snap = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4,
                                  target=tailer.target)
    stats = snap.run_interleaved(tailer, batches_per_chunk=1)
    assert sum(1 for s in stats if s.get("chunk") is not None) == 4
    assert any(s.get("stream") for s in stats)

    engine = state_df_to_dict(
        tailer.target.read().drop("bucket", "receiver_idx", "seq")
    )
    oracle = naive_replay(
        [r.asDict() for r in spark.read.parquet(journal).collect()],
        initial_state=_pages_state_dict(spark, pages),
    )
    assert set(engine) == set(oracle)
    for url, o in oracle.items():
        assert engine[url]["html"] == o["html"], url
        assert engine[url]["text"] == o["text"], url


def test_chunk_fence_resume_and_replay_skip(spark, tmpdir_path):
    """Crash between chunks: a fresh snapshotter resumes at the first
    incomplete chunk; replaying a completed chunk skips at the fence;
    tailer batches interleaved between chunks are unaffected."""
    journal = f"{tmpdir_path}/journal"
    cfg = _cfg(tmpdir_path, journal)
    pages = generate_pages(spark, GEN).drop("version")
    write_journal(spark, GEN, journal, num_files=4)
    tailer = JournalTailer(spark, cfg)

    snap = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4,
                                  target=tailer.target)
    snap.run_chunk(0)
    tailer.run_to_head(max_batches=2)  # tailer writes between chunks
    snap.run_chunk(1)
    # "crash": new snapshotter over the same sink
    snap2 = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4,
                                   target=tailer.target)
    assert snap2.completed_chunks() == 2
    assert snap2.pending_chunks() == [2, 3]
    assert snap2.run_chunk(1)["skipped"] is True  # replay fences
    rest = snap2.run_all()
    assert [s["chunk"] for s in rest] == [2, 3]
    assert not any(s.get("skipped") for s in rest)
    # the tailer's own fence domain was never disturbed: it still
    # advances (or is caught up) rather than replaying old batches
    more = tailer.run_to_head()
    assert all(not s.get("skipped") for s in more)
    assert snap2.pending_chunks() == []


def test_snapshot_rows_lose_to_stream_deletes(spark, tmpdir_path):
    """A key the stream deleted must NOT be resurrected by a later
    chunk containing its stale snapshot row (tombstone wins by
    position)."""
    journal = f"{tmpdir_path}/journal"
    cfg = _cfg(tmpdir_path, journal)
    pages = generate_pages(spark, GEN).drop("version")
    write_journal(spark, GEN, journal, num_files=4)
    tailer = JournalTailer(spark, cfg)
    tailer.run_to_head()  # stream fully applied FIRST
    deleted = {
        r["url"]
        for r in spark.read.parquet(journal)
        .filter(F.col("entry_type") == "DL")
        .select("url").distinct().collect()
    }
    live = state_df_to_dict(tailer.target.read().drop("bucket"))
    resurrectable = deleted - set(live)
    assert resurrectable, "fixture must contain net-deleted keys"

    snap = IncrementalSnapshotter(spark, cfg, pages, n_chunks=2,
                                  target=tailer.target)
    snap.run_all()
    after = state_df_to_dict(tailer.target.read().drop("bucket"))
    assert not (set(after) & resurrectable)


def test_incremental_snapshot_via_signal(spark, tmpdir_path):
    """An execute-snapshot signal with type=incremental runs the
    chunked path under a per-signal fence: crash mid-signal resumes
    at the first incomplete chunk; a replayed signal is a no-op."""
    from debezium_connector_ibmi_spark.streaming.signals import (
        EXECUTE_SNAPSHOT,
        SignalProcessor,
        send_signal,
    )

    journal = f"{tmpdir_path}/journal"
    cfg = _cfg(tmpdir_path, journal)
    write_journal(spark, GEN, journal, num_files=4)
    tailer = JournalTailer(spark, cfg)
    tailer.run_to_head()
    before = state_df_to_dict(tailer.target.read().drop("bucket"))

    pages = generate_pages(spark, GEN).drop("version")
    extra = pages.limit(2).withColumn(
        "url", F.concat(F.col("url"), F.lit("?inc=1"))
    )
    proc = SignalProcessor(
        spark, cfg, pages_provider=lambda t: pages.unionByName(extra)
    )
    sig_path = proc.signal_path
    send_signal(
        spark, sig_path, 1, EXECUTE_SNAPSHOT,
        {"type": "incremental", "chunks": 3},
    )
    res = proc.poll()
    assert res and res[0]["incremental"] and res[0]["chunks_run"] == 3

    after = state_df_to_dict(tailer.target.read().drop("bucket"))
    # stream-owned keys untouched; only the 2 never-seen keys landed
    new_keys = set(after) - set(before)
    assert new_keys == {u + "?inc=1" for u in
                        (r["url"] for r in pages.limit(2).collect())}
    for k in before:
        assert after[k]["html"] == before[k]["html"], k

    # replayed signal: fence makes it a no-op (already recorded)
    assert proc.poll() == []


def test_materialized_chunks_match_direct_and_prune(spark, tmpdir_path):
    """Round-4: materialize_chunks pre-buckets the source once; every
    chunk read is then partition-pruned (PartitionFilters on __chunk)
    and yields exactly the same rows as the direct hash-filter path."""
    cfg = _cfg(tmpdir_path, f"{tmpdir_path}/journal")
    pages = generate_pages(spark, GEN).drop("version")
    direct = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4)
    prepared = IncrementalSnapshotter(spark, cfg, pages, n_chunks=4)
    prepared.materialize_chunks(f"{tmpdir_path}/chunks")
    for i in range(4):
        a = sorted(r["url"] for r in direct._chunk_df(i).collect())
        b = sorted(r["url"] for r in prepared._chunk_df(i).collect())
        assert a == b, i
        plan = prepared._chunk_df(i)._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(__chunk" in plan, plan[:500]
