"""Additional operator coverage: null-indicator masking (F7), scalar
string helpers (C5/C12), sessionization (gap windows), rollup and
pivot aggregations (SURVEY.md §2.6 categories).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.functions.decode import split_object_name


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --- F7: null-indicator mask applied to row values -----------------------
def cdc_null_mask(spark, sf_dir):
    """The BCD null-indicator semantics
    (JournalFileEntryDecoder.java:41-57): a per-column boolean mask
    nulls out value slots. Mask derived deterministically here."""
    df = _events(spark, sf_dir).withColumn(
        "null_mask",
        F.array(
            F.pmod(F.col("event_id"), F.lit(3)) == 0,
            F.pmod(F.col("event_id"), F.lit(5)) == 0,
        ),
    )
    return df.select(
        "event_id",
        F.when(~F.element_at("null_mask", 1), F.col("value")).alias("value_masked"),
        F.when(~F.element_at("null_mask", 2), F.col("event_type")).alias(
            "type_masked"
        ),
    )


# --- sessionization (A2-style ordered gap detection) ------------------------
def cdc_session_count(spark, sf_dir):
    """Sessions per user: a new session starts when the gap to the
    previous event exceeds 30 minutes (lag + conditional sum — the
    receiver 'lastJoined' gap logic generalized)."""
    from debezium_connector_ibmi_spark.queries.cdc import _ensure_utc

    _ensure_utc(spark)
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")  # NTZ -> epoch (UTC session)
    gap = ts_s - F.lag(ts_s).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        df.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- C12: pad/trim helpers ----------------------------------------------------
def fn_pad_trim(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        F.lpad("event_type", 10, "*").alias("padded_l"),
        F.rpad("event_type", 10, ".").alias("padded_r"),
        F.trim(F.lpad("event_type", 12, " ")).alias("trimmed"),
    )


# --- C5: 30-char object-name split ----------------------------------------------
def fn_object_split(spark, sf_dir):
    """Build a fixed-width 30-char object name (file|library|member,
    10 chars each — EntryHeader.java:104-118) and split it back."""
    df = _events(spark, sf_dir).withColumn(
        "obj",
        F.concat(
            F.rpad("event_type", 10, " "),
            F.rpad(F.col("user_id").cast("string"), 10, " "),
            F.rpad(F.lit("M00"), 10, " "),
        ),
    )
    parts = split_object_name("obj")
    return df.select(
        "event_id",
        parts.getField("file").alias("obj_file"),
        parts.getField("library").alias("obj_library"),
        parts.getField("member").alias("obj_member"),
    )


# --- rollup aggregation ------------------------------------------------------------
def rel_rollup_status(spark, sf_dir):
    """SUMs carried as integer cents (BIGINT) so the result hashes
    identically on any engine — see queries/relational.py module doc."""
    from debezium_connector_ibmi_spark.queries.relational import _units

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_units(F.col("o_totalprice"), 100)).alias("total_c"),
    )


# --- manual pivot (conditional aggregation) -------------------------------------------
def rel_pivot_returnflag(spark, sf_dir):
    from debezium_connector_ibmi_spark.queries.relational import _units

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty_c = _units(F.col("l_quantity"), 100)
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", qty_c)).alias("qty_open_c"),
        F.sum(F.when(F.col("l_linestatus") == "F", qty_c)).alias(
            "qty_filled_c"
        ),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES = {
    "cdc_null_mask": cdc_null_mask,
    "cdc_session_count": cdc_session_count,
    "fn_pad_trim": fn_pad_trim,
    "fn_object_split": fn_object_split,
    "rel_rollup_status": rel_rollup_status,
    "rel_pivot_returnflag": rel_pivot_returnflag,
}

ORACLES = {
    "cdc_null_mask": """
        SELECT event_id,
               CASE WHEN NOT (event_id % 3 = 0) THEN value END AS value_masked,
               CASE WHEN NOT (event_id % 5 = 0) THEN event_type END AS type_masked
        FROM events
    """,
    "cdc_session_count": """
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM (
            SELECT user_id,
                   CASE WHEN prev_ts IS NULL
                             OR epoch(ts) - epoch(prev_ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM (
                SELECT user_id, ts,
                       lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_ts
                FROM events
            )
        ) GROUP BY user_id
    """,
    "fn_pad_trim": """
        SELECT event_id,
               lpad(event_type, 10, '*') AS padded_l,
               rpad(event_type, 10, '.') AS padded_r,
               trim(lpad(event_type, 12, ' ')) AS trimmed
        FROM events
    """,
    "fn_object_split": """
        SELECT event_id,
               trim(substring(obj, 1, 10)) AS obj_file,
               trim(substring(obj, 11, 10)) AS obj_library,
               trim(substring(obj, 21, 10)) AS obj_member
        FROM (
            SELECT event_id,
                   rpad(event_type, 10, ' ')
                   || rpad(CAST(user_id AS VARCHAR), 10, ' ')
                   || rpad('M00', 10, ' ') AS obj
            FROM events
        )
    """,
    "rel_rollup_status": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_c
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "rel_pivot_returnflag": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'O'
                        THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS qty_open_c,
               CAST(sum(CASE WHEN l_linestatus = 'F'
                        THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS qty_filled_c,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
}
