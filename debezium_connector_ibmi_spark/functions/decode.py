"""Vectorized journal-entry payload decode (operators C3/C6/C8).

The reference decodes each journal entry's row image byte-at-a-time on
the JVM (``JdbcFileDecoder.decodeFile``, JdbcFileDecoder.java:81-104,
charset handling CcsidCache.java:29-71, control-char scrub
``As400ValueConverters.java:27-71``). Here the payload is a ``binary``
column of raw html and decode is ONE Arrow-batched pandas UDF:
``html: binary -> text: string`` — no per-row Python in the engine.

Determinism contract (BASELINE.json: "byte-identical extracted text
per url"): every step below is a pure byte/regex transformation with
explicit encodings and a fixed entity table — no locale, no version-
dependent library. The same bytes always yield the same text.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --- pure-pandas pipeline (unit-testable without Spark) -------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
# fixed entity table — intentionally NOT html.unescape (full named-
# entity tables differ across Python versions; this set is frozen)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # must be last
]
# C8 scrub: reference replaces all of \p{Cc}\p{Cf}\p{Co}\p{Cs}\p{Cn}
# with '?'. We keep \t\n\r (they are whitespace-normalized away next
# step) and scrub the rest of Cc + DEL/C1 + surrogates/nonchars.
_CTRL_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f\ud800-\udfff﷐-﷯￾￿]"
)
_WS_RE = re.compile(r"\s+")


def extract_text_pd(html: pd.Series) -> pd.Series:
    """bytes(html) -> str(text), deterministic.

    Steps: utf-8 decode (replace) -> drop script/style/comments ->
    tags to spaces -> fixed entity unescape -> control-char scrub
    ('?') -> whitespace collapse + strip.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    mask = s.notna()
    t = s[mask]
    t = t.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    t = t.str.replace(_COMMENT_RE, " ", regex=True)
    t = t.str.replace(_TAG_RE, " ", regex=True)
    for ent, rep in _ENTITIES:
        t = t.str.replace(ent, rep, regex=False)
    t = t.str.replace(_CTRL_RE, "?", regex=True)
    t = t.str.replace(_WS_RE, " ", regex=True).str.strip()
    out = pd.Series([None] * len(s), index=s.index, dtype="object")
    out[mask] = t
    return out


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched html->text decode (the engine's hot-path UDF)."""
    return extract_text_pd(html)


# --- JVM-side helpers (no UDF) ---------------------------------------


def scrub_control_chars(col: Column | str) -> Column:
    """Column version of the C8 scrub for already-string columns.

    ``regexp_replace`` with Java unicode classes — matches the
    reference's replacement classes exactly
    (As400ValueConverters.java:27-71).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\p{Cc}\p{Cf}\p{Co}\p{Cs}\p{Cn}]", "?")


def split_object_name(col: Column | str) -> Column:
    """Operator C5: 30-char journal object name -> struct(file,
    library, member), each fixed 10 chars, trimmed
    (EntryHeader.java:104-118)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.trim(F.substring(c, 1, 10)).alias("file"),
        F.trim(F.substring(c, 11, 10)).alias("library"),
        F.trim(F.substring(c, 21, 10)).alias("member"),
    )
