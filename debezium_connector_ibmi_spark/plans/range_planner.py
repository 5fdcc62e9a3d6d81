"""Micro-batch range planner (operator T3 — ReceiverPagination
analogue) and receiver-chain lineage (S4/S5/A2).

Reference behavior re-expressed:
- ``ReceiverPagination.findRange`` caps each fetch at
  ``maxServerSideEntries`` and walks the receiver chain across
  sequence resets (ReceiverPagination.java:28-73,96-108,149-229).
- ``JournalInfoRetrieval.getReceivers`` discovers the chain with
  per-receiver [start,end] ranges (JournalInfoRetrieval.java:247-343).

Here the "chain" is a tiny driver-side table aggregated from the
journal itself (one columnar scan of two columns), and a range is a
pair of (receiver_idx, seq) positions. The planner is pure logic —
unit-tested against the reference's ReceiverPaginationTest edge
cases (within-receiver pagination, spanning receivers, seq resets,
caps).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Position:
    receiver_idx: int
    seq: int
    processed: bool = True


@dataclass(frozen=True)
class PositionRange:
    """Half-open-ish range: entries e with start < e <= end in
    (receiver_idx, seq) order (start inclusive when start.processed
    is False — JournalProcessedPosition.java:15-21 semantics)."""

    start: Position
    end: Position

    def predicate(self) -> Column:
        r, s = F.col("receiver_idx"), F.col("seq")
        if self.start.processed:
            lower = (r > self.start.receiver_idx) | (
                (r == self.start.receiver_idx) & (s > self.start.seq)
            )
        else:
            lower = (r > self.start.receiver_idx) | (
                (r == self.start.receiver_idx) & (s >= self.start.seq)
            )
        upper = (r < self.end.receiver_idx) | (
            (r == self.end.receiver_idx) & (s <= self.end.seq)
        )
        return lower & upper


def receiver_lineage(journal: DataFrame) -> list[dict]:
    """Driver-side receiver chain: (receiver_idx, receiver, min_seq,
    max_seq, n_entries), ordered by chain index. Columnar scan of
    metadata columns only — at 100 TB this reads parquet footers +
    two small columns, and on Iceberg it is a pure manifest query."""
    rows = (
        journal.groupBy("receiver_idx", "receiver")
        .agg(
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            F.count(F.lit(1)).alias("n_entries"),
        )
        .orderBy("receiver_idx")
        .collect()
    )
    return [r.asDict() for r in rows]


def plan_next_range(
    chain: list[dict],
    start: Position,
    max_entries: int,
) -> PositionRange | None:
    """Next bounded fetch range after ``start``, or None if caught up.

    Walks the chain like RangeFinder.next (ReceiverPagination.java:
    160-195): sequence numbers may reset between receivers, so the
    budget is consumed per-receiver using that receiver's own
    [min_seq, max_seq] bounds. The cap is on *entries remaining in
    the plan's seq span*, which upper-bounds actual entries (seq may
    have gaps), mirroring the reference's server-side cap semantics.
    """
    budget = max_entries
    end: Position | None = None
    for rcv in chain:
        ridx, lo, hi = rcv["receiver_idx"], rcv["min_seq"], rcv["max_seq"]
        if ridx < start.receiver_idx:
            continue
        if ridx == start.receiver_idx:
            # resume point inside (or at the edge of) this receiver
            from_seq = start.seq + (1 if start.processed else 0)
            if from_seq > hi:
                continue  # receiver fully consumed
            from_seq = max(from_seq, lo)
        else:
            from_seq = lo
        span = hi - from_seq + 1
        if span <= 0:
            continue
        if span >= budget:
            end = Position(ridx, from_seq + budget - 1)
            budget = 0
            break
        budget -= span
        end = Position(ridx, hi)
    if end is None:
        return None
    return PositionRange(start=start, end=end)
