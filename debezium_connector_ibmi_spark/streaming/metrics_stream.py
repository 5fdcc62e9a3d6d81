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
