"""C1/C2: binary entry-header roundtrip (golden-bytes analogue of
JournalEntryDecoderTestIT)."""

from __future__ import annotations

import pandas as pd

from debezium_connector_ibmi_spark.functions.decode import split_object_name
from debezium_connector_ibmi_spark.functions.header_codec import (
    HEADER_LEN,
    decode_header_udf,
    decode_headers_np,
    encode_header,
)

GOLDEN = [
    dict(
        next_entry_offset=63,
        sequence=12345678901234,
        entry_ts_us=1704067200_000_000,
        journal_code="R",
        entry_type="UP",
        commit_cycle=42,
        object_name="PAGES     WEBLIB    M001",
        payload_length=512,
    ),
    dict(
        next_entry_offset=0,
        sequence=1,
        entry_ts_us=0,
        journal_code="C",
        entry_type="SC",
        commit_cycle=0,
        object_name="",
        payload_length=0,
    ),
]


def test_roundtrip_numpy():
    blobs = pd.Series([encode_header(**g) for g in GOLDEN], dtype="object")
    assert all(len(b) == HEADER_LEN for b in blobs)
    out = decode_headers_np(blobs)
    for i, g in enumerate(GOLDEN):
        for k, v in g.items():
            got = out.iloc[i][k]
            if k == "object_name":
                assert got.rstrip() == v.rstrip()
            else:
                assert got == v, (k, got, v)


def test_roundtrip_spark_and_object_split(spark):
    blobs = [(encode_header(**g),) for g in GOLDEN]
    df = spark.createDataFrame(blobs, "blob binary")
    out = df.select(decode_header_udf("blob").alias("h")).select("h.*")
    rows = out.collect()
    assert rows[0]["sequence"] == GOLDEN[0]["sequence"]
    assert rows[0]["journal_code"] == "R"
    assert rows[0]["entry_type"] == "UP"
    # C5: 30-char object name splits into file/library/member
    parts = (
        out.select(split_object_name("object_name").alias("p"))
        .select("p.*")
        .collect()[0]
    )
    assert parts["file"] == "PAGES"
    assert parts["library"] == "WEBLIB"
    assert parts["member"] == "M001"


def test_empty_batch():
    out = decode_headers_np(pd.Series([], dtype="object"))
    assert len(out) == 0

def test_expression_decode_equals_numpy_decode(spark):
    """The default JVM-expression decode (decode_header_cols:
    substring/hex/conv, whole-stage codegen) must produce exactly the
    numpy frombuffer UDF's output on every field, including non-ASCII-
    safe edge values."""
    from debezium_connector_ibmi_spark.functions.header_codec import (
        decode_header_cols,
    )

    cases = list(GOLDEN) + [
        dict(
            next_entry_offset=0,
            sequence=2**40 + 12345,
            entry_ts_us=1,
            journal_code="D",
            entry_type="CG",
            commit_cycle=0,
            object_name="",
            payload_length=65535,
        )
    ]
    blobs = [(encode_header(**g),) for g in cases]
    df = spark.createDataFrame(blobs, "blob binary")
    via_expr = df.select(decode_header_cols("blob").alias("h")).select("h.*")
    via_udf = df.select(decode_header_udf("blob").alias("h")).select("h.*")
    a = [tuple(r) for r in via_expr.collect()]
    b = [tuple(r) for r in via_udf.collect()]
    assert a == b
    # and the expression path stays inside codegen (no Python node)
    plan = via_expr._sc._jvm.PythonSQLUtils.explainString(
        via_expr._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    # '*' node prefix marks whole-stage-codegen participation in the
    # formatted plan
    assert "* Project" in plan
