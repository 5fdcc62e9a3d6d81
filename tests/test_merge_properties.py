"""Property-based sink-merge fuzz: ANY op sequence, partitioned into
ANY batch split, applied through KeyBucketedTarget.merge (with the
engine's compaction semantics) must equal the naive ordered fold —
including replays of every batch."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

KEYS = ["u0", "u1", "u2"]

# an op sequence: (key_idx, op) — positions are the sequence index
ops_strategy = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1), st.sampled_from("cud")),
    min_size=1,
    max_size=24,
)
splits_strategy = st.lists(st.integers(1, 6), min_size=1, max_size=5)


def fold(ops):
    state = {}
    for seq, (k, op) in enumerate(ops):
        key = KEYS[k]
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = f"v{seq}"
    return state


def compact(batch_rows):
    last = {}
    for seq, key, op, text in batch_rows:
        last[key] = (seq, key, op, text)  # rows arrive seq-ascending
    return list(last.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy, splits=splits_strategy)
def test_any_batching_matches_fold(spark, tmp_path_factory, ops, splits):
    tgt_dir = str(tmp_path_factory.mktemp("merge_prop"))
    t = KeyBucketedTarget(spark, tgt_dir, num_buckets=2)
    rows = [
        (seq, KEYS[k], op, f"v{seq}") for seq, (k, op) in enumerate(ops)
    ]
    # partition rows into batches by the cyclic split sizes
    batches, i, si = [], 0, 0
    while i < len(rows):
        n = splits[si % len(splits)]
        batches.append(rows[i : i + n])
        i += n
        si += 1
    for bid, batch_rows in enumerate(batches):
        b = spark.createDataFrame(
            [(key, 0, seq, op, text) for seq, key, op, text in compact(batch_rows)],
            "url string, receiver_idx int, seq long, op string, text string",
        )
        r = t.merge(b, batch_id=bid, watermark=(0, batch_rows[-1][0]))
        assert r["skipped"] is False
        # replay the same batch id: must be skipped, state unchanged
        assert t.merge(b, batch_id=bid)["skipped"] is True

    expected = fold(ops)
    cur = t.read()
    got = (
        {r["url"]: r["text"] for r in cur.collect()} if cur is not None else {}
    )
    assert got == expected
    assert t.watermark() == (0, len(rows) - 1)
