"""S6 journal-for-table discovery + C14 XA decode (round 5).

Reference semantics pinned here:
- JournalInfoRetrieval.getJournal overloads (java:76-153): library
  path regex, FILD0100 offset-chained buffer, unique-journal
  assertion over a filter list;
- XaTransactionDecoder.java:14-40: Bin4|Bin4|Text(80) struct with
  EBCDIC text and two's-complement ints.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.functions.typeconv import (
    XA_RECORD_LEN,
    decode_xa_transaction,
)
from debezium_connector_ibmi_spark.sources.discovery import (
    JournalInfo,
    decode_fild0100_journal,
    journal_for_table,
    parse_journal_path,
    resolve_journal,
)


# --- library-level path parse (JOURNAL_REGEX) ----------------------------
def test_parse_journal_path_match():
    ji = parse_journal_path("/QSYS.LIB/WEBLIB.LIB/WEBJRN.JRN")
    assert ji == JournalInfo(name="WEBJRN", library="WEBLIB")


def test_parse_journal_path_no_match_raises():
    with pytest.raises(RuntimeError, match="Journal not found"):
        parse_journal_path("/QSYS.LIB/WEBLIB.LIB/NOTAJOURNAL.FILE")


# --- catalog resolution ---------------------------------------------------
def _catalog(spark):
    rows = [
        # library-level default (table_name NULL = QSQJRN convention)
        ("WEBLIB", None, "QSQJRN", "WEBLIB"),
        # table-level override
        ("WEBLIB", "PAGES", "PAGEJRN", "JLIB"),
        ("WEBLIB", "LINKS", "PAGEJRN", "JLIB"),
        ("OTHERLIB", "T1", "OTHJRN", "OTHERLIB"),
    ]
    return spark.createDataFrame(
        rows, "library string, table_name string, journal_name string, "
        "journal_library string"
    )


def test_table_override_wins(spark):
    ji = journal_for_table(_catalog(spark), "WEBLIB", "PAGES")
    assert ji == JournalInfo("PAGEJRN", "JLIB")


def test_library_fallback(spark):
    ji = journal_for_table(_catalog(spark), "WEBLIB", "NOJRNTBL")
    assert ji == JournalInfo("QSQJRN", "WEBLIB")


def test_missing_library_raises(spark):
    with pytest.raises(RuntimeError, match="Journal not found"):
        journal_for_table(_catalog(spark), "NOPE", "T")


def test_resolve_empty_includes_uses_library_default(spark):
    ji = resolve_journal(_catalog(spark), "WEBLIB", [])
    assert ji == JournalInfo("QSQJRN", "WEBLIB")


def test_resolve_single_journal_for_filter_set(spark):
    ji = resolve_journal(
        _catalog(spark), "WEBLIB", [("WEBLIB", "PAGES"), ("WEBLIB", "LINKS")]
    )
    assert ji == JournalInfo("PAGEJRN", "JLIB")


def test_resolve_mixed_journals_raises(spark):
    # PAGES -> PAGEJRN, unknown table -> library default QSQJRN: two
    # distinct journals for one filter set is a config error
    # (JournalInfoRetrieval.java:104-106)
    with pytest.raises(ValueError, match="more than one journal"):
        resolve_journal(
            _catalog(spark), "WEBLIB", [("WEBLIB", "PAGES"), ("WEBLIB", "X")]
        )


def test_resolve_schema_mismatch_raises(spark):
    with pytest.raises(ValueError, match="does not match"):
        resolve_journal(_catalog(spark), "WEBLIB", [("OTHERLIB", "T1")])


# --- FILD0100 offset-chained decode (golden buffer) ----------------------
def _fild0100_bytes(hdr: int, rel: int, name: str, lib: str) -> bytes:
    buf = bytearray(hdr + rel + 20)
    buf[378:382] = hdr.to_bytes(4, "big")
    buf[hdr + 378 : hdr + 382] = rel.to_bytes(4, "big")
    orn = hdr + rel
    buf[orn : orn + 10] = name.ljust(10).encode("cp037")
    buf[orn + 10 : orn + 20] = lib.ljust(10).encode("cp037")
    return bytes(buf)


def test_fild0100_decode_follows_offset_chain(spark):
    blob = _fild0100_bytes(512, 400, "WEBJRN", "WEBLIB")
    df = spark.createDataFrame([(blob,)], "b binary").select(
        decode_fild0100_journal("b", ccsid=37).alias("j")
    )
    row = df.select("j.journal_name", "j.journal_library").first()
    assert (row["journal_name"], row["journal_library"]) == (
        "WEBJRN",
        "WEBLIB",
    )


def test_fild0100_decode_offsets_vary_per_row(spark):
    rows = [
        (_fild0100_bytes(400, 382, "JRNA", "LIBA"),),
        (_fild0100_bytes(496, 414, "JRNB", "LIBB"),),
    ]
    df = spark.createDataFrame(rows, "b binary").select(
        decode_fild0100_journal("b", ccsid=37).alias("j")
    )
    got = sorted(
        (r["j"]["journal_name"], r["j"]["journal_library"])
        for r in df.collect()
    )
    assert got == [("JRNA", "LIBA"), ("JRNB", "LIBB")]


# --- C14 XA decode --------------------------------------------------------
def _xa_bytes(srcdat: int, srcseq: int, text: str) -> bytes:
    return (
        srcdat.to_bytes(4, "big", signed=True)
        + srcseq.to_bytes(4, "big", signed=True)
        + text.ljust(80).encode("cp037")
    )


def test_xa_decode_golden_roundtrip(spark):
    blob = _xa_bytes(20240131, 7, "XID-BRANCH-01")
    assert len(blob) == XA_RECORD_LEN
    df = spark.createDataFrame([(blob,)], "b binary").select(
        decode_xa_transaction("b").alias("xa")
    )
    row = df.select("xa.srcdat", "xa.srcseq", "xa.srcdta").first()
    assert (row["srcdat"], row["srcseq"], row["srcdta"]) == (
        20240131,
        7,
        "XID-BRANCH-01",
    )


def test_xa_decode_negative_int_sign_fold(spark):
    blob = _xa_bytes(-1, -2147483648, "NULLXID")
    df = spark.createDataFrame([(blob,)], "b binary").select(
        decode_xa_transaction("b").alias("xa")
    )
    row = df.first()["xa"]
    assert (row["srcdat"], row["srcseq"], row["srcdta"]) == (
        -1,
        -2147483648,
        "NULLXID",
    )


def test_xa_decode_honors_offset(spark):
    blob = b"\xde\xad\xbe\xef" * 4 + _xa_bytes(5, 6, "OFFSET")
    df = spark.createDataFrame([(blob,)], "b binary").select(
        decode_xa_transaction("b", offset=16).alias("xa")
    )
    row = df.first()["xa"]
    assert (row["srcdat"], row["srcseq"], row["srcdta"]) == (5, 6, "OFFSET")
