"""Event-time streaming metrics (SURVEY.md §2.6 watermark/window row)
and cross-batch stateful before/after pairing (T1 at full fidelity).

1. ``windowed_op_counts``: Debezium's TotalNumberOf*EventsSeen
   counters re-expressed as event-time tumbling-window aggregates
   with a late-data watermark — ``withWatermark(entry_ts) →
   groupBy(window, op).count()``.

2. ``pair_stream_stateful``: the reference pairs R.UB with the next
   R.UP through an in-memory single-slot cache
   (As400StreamingChangeEventSource.java:51,87-101) and silently
   loses the pair when a restart lands between the two entries. The
   ``applyInPandasWithState`` version keeps the pending before-image
   in *checkpointed* state keyed by (table_name, url), so pairs
   survive micro-batch boundaries and restarts — strictly stronger
   than the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from debezium_connector_ibmi_spark.functions.optype import op_type_col


def windowed_op_counts(
    stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-op event counts in event-time tumbling windows."""
    tagged = stream.withColumn("op", op_type_col()).filter(
        F.col("op").isin("c", "u", "d")
    )
    return (
        tagged.withWatermark("entry_ts", watermark)
        .groupBy(F.window("entry_ts", window), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "op",
            "n",
        )
    )


def dedup_stream(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time duplicate-delivery guard (§2.6 'late data' row): an
    at-least-once transport may redeliver journal entries; identical
    positions within the watermark horizon are dropped by Spark's
    checkpointed dedup state (``dropDuplicatesWithinWatermark``), so
    state size is bounded by the horizon instead of growing forever
    (plain dropDuplicates would). The sink's position-aware merge
    makes duplicates harmless anyway — this operator keeps them from
    consuming downstream compute."""
    return stream.withWatermark("entry_ts", watermark).dropDuplicatesWithinWatermark(
        ["receiver_idx", "seq"]
    )


PAIRED_SCHEMA = (
    "table_name string, url string, receiver_idx int, seq long, "
    "op string, before_html binary, html binary"
)
_STATE_SCHEMA = "pending_before binary, pending_ridx int, pending_seq long"


def _make_pair_group(pending_ttl_ms: int | None):
    """Build the per-key pairing function; ``pending_ttl_ms`` bounds
    how long an unmatched UB may park in state (None = forever)."""

    def _pair_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        """Stateful UB->UP pairing for one (table_name, url) key.

        State = the pending before-image (a UB seen with no UP yet).
        Events inside each batch are processed in (receiver_idx, seq)
        order; a UB that ends a batch parks in state and pairs with
        the first UP of a later batch. With a TTL, an orphaned UB
        (journal corruption / filtered-away UP) expires instead of
        pinning state forever — the bounded-state equivalent of the
        reference's single-slot cache being overwritten, but explicit
        and time-based.
        """
        if state.hasTimedOut:
            state.remove()  # orphaned UB abandoned (TTL horizon)
            return
        table_name, url = key
        if state.exists:
            pending_before, pending_ridx, pending_seq = state.get
        else:
            pending_before, pending_ridx, pending_seq = None, None, None

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["receiver_idx", "seq"])
            for r in pdf.itertuples(index=False):
                if r.op == "b":
                    pending_before = (
                        bytes(r.before_html)
                        if r.before_html is not None
                        else None
                    )
                    pending_ridx, pending_seq = int(r.receiver_idx), int(r.seq)
                    continue
                before = r.before_html
                if r.op == "u" and before is None and pending_before is not None:
                    before = pending_before
                if r.op in ("c", "u", "d"):
                    pending_before = None  # consumed / invalidated
                    out_rows.append(
                        (
                            table_name,
                            url,
                            int(r.receiver_idx),
                            int(r.seq),
                            r.op,
                            bytes(before) if before is not None else None,
                            bytes(r.html) if r.html is not None else None,
                        )
                    )
        if pending_before is not None:
            state.update((pending_before, pending_ridx, pending_seq))
            if pending_ttl_ms:
                state.setTimeoutDuration(pending_ttl_ms)
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "table_name",
                    "url",
                    "receiver_idx",
                    "seq",
                    "op",
                    "before_html",
                    "html",
                ],
            )

    return _pair_group


TXN_SCHEMA = (
    "commit_cycle long, first_seq long, last_seq long, event_count long, "
    "saw_begin int, saw_end int, begin_ts timestamp, end_ts timestamp"
)
_TXN_STATE_SCHEMA = (
    "first_seq long, last_seq long, event_count long, saw_begin int, "
    "begin_ts_ns long, end_ts_ns long"
)


def _make_txn_group(open_ttl_ms: int | None):
    def _txn_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        """Stateful commit-cycle grouping for one commit_cycle key.

        The reference tags events through an in-memory ``txMap`` keyed
        by commitCycle and LOSES open transactions on restart
        (As400StreamingChangeEventSource.java:217-241). Here the open
        transaction (SC seen, CM not yet) lives in CHECKPOINTED state,
        so an SC..CM window spanning micro-batches — or a full restart
        — still emits exactly one complete transaction row. A TTL
        bounds state held for abandoned cycles (rolled-back or
        filtered-away CM): expired cycles are dropped, the explicit
        time-based analogue of the reference's forgetting.
        """
        if state.hasTimedOut:
            state.remove()  # abandoned cycle (no CM inside the TTL)
            return
        (commit_cycle,) = key
        if state.exists:
            first_seq, last_seq, event_count, saw_begin, begin_ns, end_ns = state.get
        else:
            first_seq = last_seq = None
            event_count, saw_begin = 0, 0
            begin_ns = end_ns = None

        saw_end = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["receiver_idx", "seq"])
            for r in pdf.itertuples(index=False):
                seq = int(r.seq)
                first_seq = seq if first_seq is None else min(first_seq, seq)
                last_seq = seq if last_seq is None else max(last_seq, seq)
                ts_ns = None if pd.isna(r.entry_ts) else int(pd.Timestamp(r.entry_ts).value)
                if ts_ns is not None:
                    begin_ns = ts_ns if begin_ns is None else min(begin_ns, ts_ns)
                    end_ns = ts_ns if end_ns is None else max(end_ns, ts_ns)
                if r.op == "txn_begin":
                    saw_begin = 1
                elif r.op == "txn_end":
                    saw_end = 1
                elif r.op in ("c", "u", "d"):
                    event_count += 1

        if saw_end:
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                [
                    (
                        int(commit_cycle),
                        first_seq,
                        last_seq,
                        event_count,
                        saw_begin,
                        1,
                        pd.Timestamp(begin_ns) if begin_ns is not None else pd.NaT,
                        pd.Timestamp(end_ns) if end_ns is not None else pd.NaT,
                    )
                ],
                columns=[
                    "commit_cycle",
                    "first_seq",
                    "last_seq",
                    "event_count",
                    "saw_begin",
                    "saw_end",
                    "begin_ts",
                    "end_ts",
                ],
            )
        else:
            state.update(
                (first_seq, last_seq, event_count, saw_begin, begin_ns, end_ns)
            )
            if open_ttl_ms:
                state.setTimeoutDuration(open_ttl_ms)

    return _txn_group


def txn_group_stream_stateful(
    stream: DataFrame, open_ttl_ms: int | None = None
) -> DataFrame:
    """Cross-batch commit-cycle transaction grouping (T2 at full
    fidelity — stronger than the reference, whose in-memory txMap
    loses open transactions on restart).

    Input: a journal stream; output: ONE complete transaction row per
    commit cycle, emitted when its CM arrives — even when SC and CM
    land in different micro-batches or on different sides of a
    restart (state is checkpointed). Same row shape as the batch-mode
    ``operators.transactions.transaction_summary``. State is
    per-OPEN-cycle only (closed cycles leave state immediately),
    bounded by in-flight transaction count, with an optional TTL for
    abandoned cycles.
    """
    tagged = stream.withColumn("op", op_type_col()).filter(
        F.col("commit_cycle").isNotNull()
        & F.col("op").isin("txn_begin", "txn_end", "c", "u", "d")
    )
    return (
        tagged.select("commit_cycle", "receiver_idx", "seq", "op", "entry_ts")
        .groupBy("commit_cycle")
        .applyInPandasWithState(
            _make_txn_group(open_ttl_ms),
            outputStructType=TXN_SCHEMA,
            stateStructType=_TXN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if open_ttl_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def pair_stream_stateful(
    stream: DataFrame, pending_ttl_ms: int | None = None
) -> DataFrame:
    """Cross-batch UB/UP pairing over a journal stream.

    Input: filtered journal stream rows with op in (b, c, u, d).
    Output: data events with before-images attached, pairs preserved
    across micro-batch boundaries via checkpointed state.
    ``pending_ttl_ms`` (recommended at scale) expires orphaned UB
    state after a processing-time horizon so total state stays
    bounded by the in-flight pair count, not history.
    """
    tagged = stream.withColumn("op", op_type_col()).filter(
        F.col("op").isin("b", "c", "u", "d")
    )
    return (
        tagged.select(
            "table_name", "url", "receiver_idx", "seq", "op",
            "before_html", "html",
        )
        .groupBy("table_name", "url")
        .applyInPandasWithState(
            _make_pair_group(pending_ttl_ms),
            outputStructType=PAIRED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if pending_ttl_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
