"""Parity tests for the scalar/naming/typeconv function surface
(SURVEY.md §2.3 C5-C15, §2.2 F9-F11, §2.1 S9) and the chain/position
triage logic (A2, T6)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from debezium_connector_ibmi_spark.functions.names import (
    data_change_table_name,
    java_friendly_names,
    lowercase_all,
    reprefix_table_name,
    to_camel_case,
)
from debezium_connector_ibmi_spark.functions.typeconv import (
    parse_default_value,
)
from debezium_connector_ibmi_spark.plans.range_planner import (
    Position,
    usable_chain,
    validate_position,
)


def test_to_camel_case():
    # RepackageJavaFriendlySchemaRenamerTest analogues
    assert to_camel_case("a_b") == "AB"
    assert to_camel_case("order_line_item") == "OrderLineItem"
    assert to_camel_case("ALREADY") == "ALREADY"
    assert to_camel_case("with-dash and space") == "WithDashAndSpace"
    assert to_camel_case("x1_y2") == "X1Y2"


def test_java_friendly_names(spark):
    df = spark.createDataFrame([(1, "a")], "order_id int, cust_name string")
    name, out = java_friendly_names(df, "com.x", "line_item")
    assert name == "com.x.LineItemValue"
    assert out.columns == ["OrderId", "CustName"]


def test_lowercase_all(spark):
    df = spark.createDataFrame([(1,)], "OrderId int")
    assert lowercase_all(df).columns == ["orderid"]


def test_table_naming():
    assert data_change_table_name("host1", "lib", "pages") == "host1.lib.pages"
    assert reprefix_table_name("host1.LIB.PAGES", "host1", "sink") == "sink.lib.pages"
    assert reprefix_table_name("other.X", "host1", "sink") == "sink.other.x"


def test_parse_default_value():
    assert parse_default_value("INTEGER", "42") == 42
    assert parse_default_value("DOUBLE", "1.5") == 1.5
    assert parse_default_value("DECIMAL(5,2)", "12.34") == Decimal("12.34")
    assert parse_default_value("VARCHAR(10)", "'hi '") == "hi "
    assert parse_default_value("DATE", "'2024-01-31'") == dt.date(2024, 1, 31)
    assert parse_default_value(
        "TIMESTAMP", "'2024-01-31-23.59.58.123456'"
    ) == dt.datetime(2024, 1, 31, 23, 59, 58, 123456)
    assert parse_default_value("BINARY(2)", "X'0AFF'") == b"\x0a\xff"
    assert parse_default_value("INTEGER", "NULL") is None
    with pytest.raises(ValueError):
        parse_default_value("GEOMETRY", "POINT(1 1)")


def test_charset_decode_ebcdic(spark):
    """C6: EBCDIC (cp037/cp500) text decode — the reference's
    golden-value ITs use unicode strings through CCSID codecs."""
    from debezium_connector_ibmi_spark.functions.typeconv import charset_decode_udf

    text = "HELLO ibmi 123"
    rows = [(text.encode("cp037"),), (None,)]
    df = spark.createDataFrame(rows, "payload binary")
    out = df.select(charset_decode_udf(37)("payload").alias("s")).collect()
    assert out[0]["s"] == text
    assert out[1]["s"] is None
    # override map: pretend column says 37 but bytes are cp500
    special = "a[b]c"  # brackets differ between cp037 and cp500
    df2 = spark.createDataFrame([(special.encode("cp500"),)], "payload binary")
    got = df2.select(
        charset_decode_udf(37, overrides={37: 500})("payload").alias("s")
    ).collect()[0]["s"]
    assert got == special


def test_varchar_decode_length_prefix(spark):
    """C7: 2-byte char-count prefix × bytesPerChar buffer slice before
    charset decode (AS400VarChar.java:89-96) — golden strings from the
    reference's JournalEntryDecoderTestIT (Paßstraße, Maſʒſtab)."""
    from debezium_connector_ibmi_spark.functions.typeconv import (
        bytes_per_char,
        varchar_decode_udf,
    )

    # catalog-derived bytes-per-char (BytesPerChar.java:61-67)
    assert bytes_per_char(10, 10) == 1
    assert bytes_per_char(10, 20) == 2
    assert bytes_per_char(10, 5) == 1  # never below 1
    assert bytes_per_char(0, 0) == 1

    def buf(s: str, codec: str, bpc: int, max_chars: int) -> bytes:
        body = s.encode(codec)
        pad = b"\x40" * (max_chars * bpc - len(body))  # EBCDIC-space pad
        return len(s).to_bytes(2, "big") + body + pad

    # single-byte EBCDIC VARCHAR(20): padding beyond len must be cut
    text1 = "Paßstraße"
    df1 = spark.createDataFrame(
        [(buf(text1, "cp037", 1, 20),), (None,)], "payload binary"
    )
    got1 = df1.select(varchar_decode_udf(37, bpc=1)("payload").alias("s")).collect()
    assert got1[0]["s"] == text1
    assert got1[1]["s"] is None

    # VARGRAPHIC (UTF-16, 2 bytes/char): length prefix counts CHARS
    text2 = "Maſʒſtab"  # Maſʒſtab
    df2 = spark.createDataFrame(
        [(buf(text2, "utf-16-be", 2, 16),)], "payload binary"
    )
    got2 = df2.select(
        varchar_decode_udf(13488, bpc=2)("payload").alias("s")
    ).collect()
    assert got2[0]["s"] == text2

    # empty value: zero-length prefix over a padded buffer
    df3 = spark.createDataFrame([(buf("", "cp037", 1, 8),)], "payload binary")
    assert df3.select(
        varchar_decode_udf(37, bpc=1)("payload").alias("s")
    ).collect()[0]["s"] == ""


def test_decode_cyymmddhhmmss(spark):
    from debezium_connector_ibmi_spark.functions.typeconv import (
        decode_cyymmddhhmmss,
    )

    df = spark.createDataFrame(
        [("1240131235958",), ("0991231010203",)], "raw string"
    )
    got = [r["ts"] for r in df.select(decode_cyymmddhhmmss("raw").alias("ts")).collect()]
    assert got[0] == dt.datetime(2024, 1, 31, 23, 59, 58)
    assert got[1] == dt.datetime(1999, 12, 31, 1, 2, 3)


def test_usable_chain_drops_before_gap():
    chain = [
        {"receiver_idx": 0, "min_seq": 1, "max_seq": 10},
        {"receiver_idx": 1, "min_seq": 1, "max_seq": 10},
        # receiver 2 missing (detached) — 0..1 unreachable
        {"receiver_idx": 3, "min_seq": 1, "max_seq": 10},
        {"receiver_idx": 4, "min_seq": 1, "max_seq": 10},
    ]
    out = usable_chain(chain)
    assert [r["receiver_idx"] for r in out] == [3, 4]


def test_validate_position():
    chain = [
        {"receiver_idx": 2, "min_seq": 1, "max_seq": 10},
        {"receiver_idx": 3, "min_seq": 1, "max_seq": 10},
    ]
    assert validate_position(chain, Position(-1, -1))  # fresh start ok
    assert validate_position(chain, Position(2, 5))
    assert validate_position(chain, Position(3, 10))
    assert not validate_position(chain, Position(1, 500))  # receiver gone
    assert not validate_position(chain, Position(0, 0))


def test_invalid_position_fail_and_reset(spark, tmpdir_path):
    """T6 end-to-end: truncate the journal past the checkpoint; fail
    policy raises, reset policy replays from earliest available."""
    from debezium_connector_ibmi_spark.config import EngineConfig
    from debezium_connector_ibmi_spark.datagen.journal import (
        JournalGenConfig,
        generate_journal,
    )
    from debezium_connector_ibmi_spark.plans.range_planner import (
        InvalidPositionError,
    )
    from debezium_connector_ibmi_spark.streaming.engine import JournalTailer
    from pyspark.sql import functions as F

    gen = JournalGenConfig(n_urls=20, n_ops=300, receiver_rotation=25)
    full = generate_journal(spark, gen)
    jpath = f"{tmpdir_path}/journal"
    full.write.mode("overwrite").partitionBy("receiver_idx").parquet(jpath)

    cfg = EngineConfig(
        journal_path=jpath,
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
        max_entries_per_batch=400,
    )
    t = JournalTailer(spark, cfg)
    t.run_to_head(max_batches=1)
    wm = t.target.watermark()

    # truncate: drop every receiver <= watermark receiver + 1
    cut = wm[0] + 2
    truncated = full.filter(F.col("receiver_idx") >= cut)
    jpath2 = f"{tmpdir_path}/journal_trunc"
    truncated.write.mode("overwrite").partitionBy("receiver_idx").parquet(jpath2)
    cfg2 = EngineConfig(
        journal_path=jpath2,
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
    )
    with pytest.raises(InvalidPositionError):
        JournalTailer(spark, cfg2).run_to_head()

    cfg3 = EngineConfig(
        journal_path=jpath2,
        target_path=f"{tmpdir_path}/t",
        num_buckets=4,
        invalid_position_policy="reset_earliest",
    )
    stats = JournalTailer(spark, cfg3).run_to_head()
    assert any(s.get("data_loss_reset") for s in stats)
    # progressed to the truncated journal's head
    head = truncated.agg(
        F.max(F.struct("receiver_idx", "seq")).alias("h")
    ).first()["h"]
    assert JournalTailer(spark, cfg3).target.watermark() == (
        head["receiver_idx"],
        head["seq"],
    )