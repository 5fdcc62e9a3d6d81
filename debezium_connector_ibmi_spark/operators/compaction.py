"""Last-event-per-key compaction (SURVEY.md §2.6 — the engine's
upsert-materialization core).

Downstream of the reference, consumers fold the ordered I/U/D
changelog per primary key (last-writer-wins, ``ExtractNewRecordState``
in the reference README.md:188-192). Here that fold is a ranking
window: ``row_number() over (partition by key order by
(receiver_idx, seq) desc) = 1`` — one shuffle, hash-partitioned by
key, whole-stage codegen, and it makes the subsequent MERGE
order-free and idempotent (re-applying a batch is a no-op).

Skew (north rule): hot urls concentrate a partition. The salted
variant splits each key into ``salt_buckets`` sub-groups, compacts
within each (map-side-friendly first pass), then compacts the small
survivors per key — the classic two-phase skew-safe top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ("receiver_idx", "seq")


def last_event_per_key(
    events: DataFrame, key: str = "url", order_cols: tuple[str, ...] = ORDER_COLS
) -> DataFrame:
    """One row per key: the event with the greatest ``order_cols``."""
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def last_event_per_key_agg(
    events: DataFrame,
    key: str = "url",
    order_cols: tuple[str, ...] = ORDER_COLS,
    payload_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Hash-agg last-per-key: ``max_by(payload, position)``.

    The engine's default compaction plan (same shape as
    ``pipeline.compact_for_state``): a hash aggregation with PARTIAL
    map-side combine — each map task ships at most one candidate row
    per key, so shuffle volume is O(keys × map_tasks) instead of
    O(events), no sort anywhere, and hot keys collapse before they
    can pile onto one reducer (inherently skew-proof). Requires
    ``order_cols`` to be unique per key (positions are), otherwise
    max_by ties are non-deterministic.
    """
    payload_cols = tuple(payload_cols or [c for c in events.columns if c != key])
    pos = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in payload_cols])
    return (
        events.groupBy(key)
        .agg(F.max_by(payload, pos).alias("__w"))
        .select(key, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])
    )


def salted_last_event_per_key(
    events: DataFrame,
    key: str = "url",
    salt_buckets: int = 8,
    order_cols: tuple[str, ...] = ORDER_COLS,
) -> DataFrame:
    """Two-phase skew-safe compaction.

    Phase 1 partitions by (key, salt) — a hot key's millions of
    events spread over ``salt_buckets`` reducers, each keeping one
    survivor. Phase 2 compacts the <= salt_buckets survivors per key.
    Deterministic salt (hash of the ordering key) keeps replays
    byte-identical.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(key), F.lit(0) + salt).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    survivors = (
        events.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return last_event_per_key(survivors, key, order_cols)
