"""Debezium change-envelope projection (operator F8).

Reference: ``As400ChangeRecordEmitter.java:28-42`` builds
``{before, after, source, op, ts_ms}`` structs per event;
``As400SourceInfoStructMaker.java:18-41`` shapes the source block.
Here it's a single ``select`` of nested structs — pure projection,
zero cost beyond the column references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_change_envelope(events: DataFrame, connector: str = "ibmi-spark") -> DataFrame:
    """Project decoded data events into Debezium-shaped envelopes.

    Input rows carry op (c/u/d), key + payload columns, ordering and
    provenance columns. Output: ``key, before, after, source, op,
    ts_ms`` where before/after are structs of the page payload.
    """
    payload = lambda prefix: F.struct(  # noqa: E731
        F.col("url").alias("url"),
        F.col("warc_ts").alias("warc_ts"),
        F.col(prefix).alias("html"),
        F.col("lang").alias("lang"),
    )
    return events.select(
        F.col("url").alias("key"),
        F.when(F.col("op").isin("u", "d"), payload("before_html")).alias("before"),
        F.when(F.col("op").isin("c", "u"), payload("html")).alias("after"),
        F.struct(
            F.lit(connector).alias("connector"),
            F.col("table_name").alias("table"),
            F.col("receiver").alias("receiver"),
            F.col("receiver_idx").alias("receiver_idx"),
            F.col("seq").alias("sequence"),
            F.col("commit_cycle").alias("commit_cycle"),
        ).alias("source"),
        F.col("op"),
        (F.col("entry_ts").cast("double") * 1000).cast("long").alias("ts_ms"),
    )
