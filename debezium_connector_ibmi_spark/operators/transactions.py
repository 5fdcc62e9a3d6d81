"""Commit-cycle transaction grouping (operator T2) and event
counters / lag metrics (A1, A3).

Reference: ``C.SC`` opens an in-memory ``TransactionContext`` keyed by
``commitCycle``; data events are tagged; ``C.CM`` closes and emits a
transaction-commit event (``As400StreamingChangeEventSource.java:
217-241,265-285``). Batch replay turns that stateful tagging into a
plain aggregation per ``commit_cycle``. (The reference loses its
``txMap`` on restart — in-memory only — so per-batch grouping is not
a weaker guarantee than the original.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transaction_summary(entries: DataFrame) -> DataFrame:
    """One row per commit cycle: bounds, event counts, tables touched.

    The Debezium transaction-metadata topic analogue
    (``{id, event_count, data_collections}``).
    """
    return (
        entries.filter(F.col("commit_cycle").isNotNull())
        .groupBy("commit_cycle")
        .agg(
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
            F.sum(F.when(F.col("op").isin("c", "u", "d"), 1).otherwise(0)).alias(
                "event_count"
            ),
            F.max(F.when(F.col("op") == "txn_begin", 1).otherwise(0)).alias("saw_begin"),
            F.max(F.when(F.col("op") == "txn_end", 1).otherwise(0)).alias("saw_end"),
            F.min("entry_ts").alias("begin_ts"),
            F.max("entry_ts").alias("end_ts"),
        )
    )


def event_counters(events: DataFrame) -> DataFrame:
    """A3: Debezium ``TotalNumberOf{Create,Update,Delete}EventsSeen``
    re-expressed as a per-op count (metrics table row per batch)."""
    return events.groupBy("op").agg(F.count(F.lit(1)).alias("n"))


def journal_lag(journal: DataFrame, applied: DataFrame) -> DataFrame:
    """A1: ``JournalBehind`` = head position minus applied watermark,
    per receiver partition (As400RpcConnection.java:172-187)."""
    head = journal.groupBy("receiver_idx").agg(F.max("seq").alias("head_seq"))
    done = applied.groupBy("receiver_idx").agg(F.max("seq").alias("applied_seq"))
    return (
        head.join(done, "receiver_idx", "left")
        .select(
            "receiver_idx",
            "head_seq",
            F.coalesce("applied_seq", F.lit(0)).alias("applied_seq"),
            (F.col("head_seq") - F.coalesce(F.col("applied_seq"), F.lit(0))).alias(
                "behind"
            ),
        )
    )
