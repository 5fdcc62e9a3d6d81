"""Before/after image pairing (operator T1).

The reference caches each ``R.UB`` (before-image) in a single-slot
per-table map and attaches it to the next ``R.UP``
(``As400StreamingChangeEventSource.java:51,87-101,249-273``) — an
inherently serial, stateful pattern. The Spark re-expression is a
``lag`` window per (table, url): within a compaction unit the UB
entry immediately precedes its UP in (receiver_idx, seq) order, so
``lag(before_html)`` over that order recovers the pair — fully
parallel across keys, no shared state.

Minimized entries (UP with no preceding UB — journal MINENTDTA) are
handled exactly like the reference: before-image is simply null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_before_after(entries: DataFrame) -> DataFrame:
    """Attach before-images to update rows and drop the UB carriers.

    Input: filtered journal rows with op in (c, u, d, b) where 'b'
    rows carry ``before_html``. Output: one row per data event
    (c/u/d) with a ``before_html`` column populated for paired
    updates; UB rows consumed.

    Window partitions by (table_name, url): pairing only ever joins
    entries of the same row, so this shards perfectly across the
    cluster — vs. the reference's single-threaded per-table cache.
    """
    w = (
        Window.partitionBy("table_name", "url")
        .orderBy("receiver_idx", "seq")
    )
    prev_op = F.lag("op").over(w)
    prev_before = F.lag("before_html").over(w)
    prev_ridx = F.lag("receiver_idx").over(w)
    prev_seq = F.lag("seq").over(w)
    # a UB pairs with the *immediately next* entry for the same key;
    # in the journal layout that's seq adjacency within the same
    # commit cycle — the reference pairs blindly with "next UP",
    # which this reproduces (and is robust to seq gaps).
    paired = entries.withColumn(
        "paired_before",
        F.when(
            (F.col("op") == "u") & (prev_op == "b"),
            prev_before,
        ),
    ).withColumn(
        "pair_src",
        F.when(
            (F.col("op") == "u") & (prev_op == "b"),
            F.concat_ws(":", prev_ridx.cast("string"), prev_seq.cast("string")),
        ),
    )
    return (
        paired.filter(F.col("op") != "b")
        .withColumn(
            "before_html", F.coalesce(F.col("paired_before"), F.col("before_html"))
        )
        .drop("paired_before")
    )
