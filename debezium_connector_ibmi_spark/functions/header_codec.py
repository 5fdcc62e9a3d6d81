"""Binary journal-entry-header codec (operators C1/C2).

The reference walks a raw RJNE0200 byte buffer decoding a 33-field
header per entry (``EntryHeaderDecoder.decode``
rjne0200/EntryHeaderDecoder.java:48-134 — offsets, u32/u64 ints, an
8-byte DTS timestamp, EBCDIC text fields). This module re-expresses
that as a *columnar* codec: a fixed-width big-endian header record
decoded for a whole Arrow batch at once with one ``numpy.frombuffer``
call — no per-row Python.

The layout is this engine's own (documented below), not IBM's wire
format — the synthetic journal has no host to be compatible with; the
point is the vectorized binary-decode machinery.

Layout (63 bytes, big-endian):
    0  u32  next_entry_offset     (S2 cursor linkage)
    4  u64  sequence
    12 i64  entry_ts              (epoch microseconds; DTS analogue)
    20 1s   journal_code
    21 2s   entry_type
    23 u64  commit_cycle
    31 30s  object name           (file|library|member, 10+10+10)
    61 u16  payload_length
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEADER_LEN = 63
_PACK = ">IQq1s2sQ30sH"
_NP_DTYPE = np.dtype(
    [
        ("next_entry_offset", ">u4"),
        ("sequence", ">u8"),
        ("entry_ts_us", ">i8"),
        ("journal_code", "S1"),
        ("entry_type", "S2"),
        ("commit_cycle", ">u8"),
        ("object_name", "S30"),
        ("payload_length", ">u2"),
    ]
)
assert _NP_DTYPE.itemsize == HEADER_LEN

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("next_entry_offset", T.LongType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("entry_ts_us", T.LongType()),
        T.StructField("journal_code", T.StringType()),
        T.StructField("entry_type", T.StringType()),
        T.StructField("commit_cycle", T.LongType()),
        T.StructField("object_name", T.StringType()),
        T.StructField("payload_length", T.IntegerType()),
    ]
)


def encode_header(
    next_entry_offset: int,
    sequence: int,
    entry_ts_us: int,
    journal_code: str,
    entry_type: str,
    commit_cycle: int,
    object_name: str,
    payload_length: int,
) -> bytes:
    """Pack one header (test/datagen side)."""
    return struct.pack(
        _PACK,
        next_entry_offset,
        sequence,
        entry_ts_us,
        journal_code.encode("ascii"),
        entry_type.encode("ascii"),
        commit_cycle,
        object_name.ljust(30).encode("ascii"),
        payload_length,
    )


def decode_headers_np(blobs: pd.Series) -> pd.DataFrame:
    """Vectorized header decode: one frombuffer over the whole batch
    (the EntryHeaderDecoder loop inverted to columnar)."""
    if len(blobs) == 0:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in HEADER_SCHEMA.fields}
        )
    buf = b"".join(bytes(b[:HEADER_LEN]) for b in blobs)
    arr = np.frombuffer(buf, dtype=_NP_DTYPE)
    return pd.DataFrame(
        {
            "next_entry_offset": arr["next_entry_offset"].astype("int64"),
            "sequence": arr["sequence"].astype("int64"),
            "entry_ts_us": arr["entry_ts_us"].astype("int64"),
            "journal_code": np.char.decode(arr["journal_code"], "ascii"),
            "entry_type": np.char.decode(arr["entry_type"], "ascii"),
            "commit_cycle": arr["commit_cycle"].astype("int64"),
            "object_name": np.char.decode(arr["object_name"], "ascii"),
            "payload_length": arr["payload_length"].astype("int32"),
        }
    )


@F.pandas_udf(HEADER_SCHEMA)
def decode_header_udf(blob: pd.Series) -> pd.DataFrame:
    """binary -> header struct, Arrow-batched."""
    return decode_headers_np(blob)


def _be_uint(blob, pos_1based: int, nbytes: int):
    """Big-endian unsigned int from a binary slice, pure Catalyst:
    substring(binary) -> hex -> conv(16,10) -> long. Stays inside
    whole-stage codegen. conv is unsigned 64-bit: values here are
    far below 2^63 (sequence numbers, cycle ids, offsets)."""
    return F.conv(F.hex(F.substring(blob, pos_1based, nbytes)), 16, 10).cast(
        "long"
    )


def decode_header_cols(blob) -> F.Column:
    """JVM-expression header decode — the engine's DEFAULT path.

    Produces the same struct as :func:`decode_header_udf` with zero
    Python: fixed-width big-endian slices via substring/hex/conv and
    utf-8 casts for the text fields, all inside whole-stage codegen —
    no Arrow transfer of the blobs at all. The numpy UDF remains as
    the reference implementation (equality pinned in
    tests/test_header_codec.py) and for engines without conv.
    """
    c = blob if not isinstance(blob, str) else F.col(blob)
    return F.struct(
        _be_uint(c, 1, 4).alias("next_entry_offset"),
        _be_uint(c, 5, 8).alias("sequence"),
        _be_uint(c, 13, 8).alias("entry_ts_us"),
        F.substring(c, 21, 1).cast("string").alias("journal_code"),
        F.substring(c, 22, 2).cast("string").alias("entry_type"),
        _be_uint(c, 24, 8).alias("commit_cycle"),
        F.substring(c, 32, 30).cast("string").alias("object_name"),
        _be_uint(c, 62, 2).cast("int").alias("payload_length"),
    )
