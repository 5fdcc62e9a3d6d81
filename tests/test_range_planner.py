"""Range-planner unit tests — the ReceiverPaginationTest analogues
(within-receiver pagination, spanning receivers, seq resets between
receivers, capped ranges, caught-up)."""

from __future__ import annotations

from debezium_connector_ibmi_spark.plans.range_planner import (
    Position,
    plan_next_range,
)

# chain with seq resets: each receiver restarts at 1
CHAIN = [
    {"receiver_idx": 0, "receiver": "R0", "min_seq": 1, "max_seq": 100, "n_entries": 100},
    {"receiver_idx": 1, "receiver": "R1", "min_seq": 1, "max_seq": 50, "n_entries": 50},
    {"receiver_idx": 2, "receiver": "R2", "min_seq": 1, "max_seq": 200, "n_entries": 200},
]


def test_within_receiver_cap():
    rng = plan_next_range(CHAIN, Position(0, 0, processed=True), max_entries=10)
    assert (rng.end.receiver_idx, rng.end.seq) == (0, 10)


def test_resume_mid_receiver():
    rng = plan_next_range(CHAIN, Position(0, 40, processed=True), max_entries=10)
    assert (rng.end.receiver_idx, rng.end.seq) == (0, 50)


def test_unprocessed_position_is_inclusive():
    rng = plan_next_range(CHAIN, Position(0, 40, processed=False), max_entries=10)
    # budget starts at seq 40 itself
    assert (rng.end.receiver_idx, rng.end.seq) == (0, 49)


def test_spans_receivers_with_seq_reset():
    # 30 left in r0 (71..100), then budget continues into r1 from 1
    rng = plan_next_range(CHAIN, Position(0, 70, processed=True), max_entries=50)
    assert (rng.end.receiver_idx, rng.end.seq) == (1, 20)


def test_uncapped_reaches_head():
    rng = plan_next_range(CHAIN, Position(0, 0, processed=True), max_entries=10_000)
    assert (rng.end.receiver_idx, rng.end.seq) == (2, 200)


def test_caught_up_returns_none():
    assert plan_next_range(CHAIN, Position(2, 200, processed=True), 100) is None


def test_receiver_boundary_exact():
    rng = plan_next_range(CHAIN, Position(0, 100, processed=True), max_entries=25)
    assert (rng.end.receiver_idx, rng.end.seq) == (1, 25)


def test_predicate_respects_reset_ordering(spark):
    """Entries in a later receiver with *smaller* seq must be inside a
    range that spans the reset."""
    rng = plan_next_range(CHAIN, Position(0, 90, processed=True), max_entries=30)
    df = spark.createDataFrame(
        [(0, 90), (0, 91), (0, 100), (1, 1), (1, 20), (1, 21), (2, 1)],
        "receiver_idx int, seq long",
    )
    got = sorted(
        (r["receiver_idx"], r["seq"]) for r in df.filter(rng.predicate()).collect()
    )
    assert got == [(0, 91), (0, 100), (1, 1), (1, 20)]
