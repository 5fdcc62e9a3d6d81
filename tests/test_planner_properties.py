"""Property-based invariants for the range planner (hypothesis) —
the ReceiverPaginationTest edge cases generalized: for ANY receiver
chain and cap, consecutive planned ranges are disjoint, cover every
entry exactly once, respect the cap, and terminate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_connector_ibmi_spark.plans.range_planner import (
    Position,
    plan_next_range,
)


@st.composite
def chains(draw):
    n = draw(st.integers(1, 6))
    chain = []
    for i in range(n):
        lo = draw(st.integers(1, 50))
        hi = lo + draw(st.integers(0, 400))
        chain.append(
            {
                "receiver_idx": i,
                "receiver": f"R{i}",
                "min_seq": lo,
                "max_seq": hi,
                "n_entries": hi - lo + 1,
            }
        )
    return chain


def _entries(chain):
    return [
        (r["receiver_idx"], s)
        for r in chain
        for s in range(r["min_seq"], r["max_seq"] + 1)
    ]


def _in_range(rng, e):
    start, end = rng.start, rng.end
    after_start = e > (start.receiver_idx, start.seq) if start.processed else e >= (
        start.receiver_idx,
        start.seq,
    )
    return after_start and e <= (end.receiver_idx, end.seq)


@given(chains(), st.integers(1, 500))
@settings(max_examples=200, deadline=None)
def test_ranges_partition_the_journal(chain, cap):
    entries = _entries(chain)
    pos = Position(-1, -1, processed=True)
    seen = []
    for _ in range(10_000):  # termination guard
        rng = plan_next_range(chain, pos, cap)
        if rng is None:
            break
        covered = [e for e in entries if _in_range(rng, e)]
        # cap respected (cap bounds the seq-span, hence also entries)
        assert len(covered) <= cap
        # progress: each non-final range covers at least one entry
        assert covered or (rng.end.receiver_idx, rng.end.seq) >= entries[-1]
        seen.extend(covered)
        pos = Position(rng.end.receiver_idx, rng.end.seq, processed=True)
    else:
        raise AssertionError("planner did not terminate")
    # exactly-once coverage
    assert seen == entries


@given(chains(), st.integers(1, 500), st.integers(0, 5), st.integers(0, 500))
@settings(max_examples=200, deadline=None)
def test_resume_from_arbitrary_position(chain, cap, ridx, seq):
    """Resuming from ANY position yields exactly the entries after it."""
    entries = _entries(chain)
    pos = Position(ridx, seq, processed=True)
    expected = [e for e in entries if e > (ridx, seq)]
    seen = []
    for _ in range(10_000):
        rng = plan_next_range(chain, pos, cap)
        if rng is None:
            break
        seen.extend(e for e in entries if _in_range(rng, e))
        pos = Position(rng.end.receiver_idx, rng.end.seq, processed=True)
    assert seen == expected