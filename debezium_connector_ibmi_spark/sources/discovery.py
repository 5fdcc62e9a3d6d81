"""S6: journal-for-schema/table discovery.

The reference resolves *which journal a library or table logs to* in
three ways (JournalInfoRetrieval.java:76-153):

- library level: ``FileAttributes`` of ``/QSYS.LIB/<lib>.LIB`` yields
  a journal path matched by ``JOURNAL_REGEX``
  (JournalInfoRetrieval.java:73,76-91);
- table level: the ``QDBRTVFD`` FILD0100 API returns a buffer whose
  journal section is reached by *offset chaining* — an int32 at byte
  378 points at the journal header, an int32 at ``header+378`` is the
  relative offset of the journal object-reference, where the
  10-char journal name and 10-char journal library sit
  (JournalInfoRetrieval.java:118-153, decode helpers :402-406);
- filter-list level: every included table must resolve to ONE
  journal, else configuration error (JournalInfoRetrieval.java:93-111).

Spark re-expression: the per-object journal attributes live in a tiny
*journal catalog* metadata table ``(library, table_name nullable,
journal_name, journal_library)`` — rows with ``table_name IS NULL``
are the library-level default (the QSQJRN convention). Resolution is
a driver-side lookup over that bounded-small catalog (same altitude
as the reference's per-connector-start RPC), so no distributed job is
involved; the FILD0100 offset-chained wire decode is kept as a real
columnar codec (pure-Catalyst offsets + the C6 CCSID text path) so
the wire semantics stay pinned at the driver gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.functions.typeconv import (
    _be_int32,
    charset_decode_udf,
)

# FILD0100 fixed anchors (JournalInfoRetrieval.java:141-146)
FILD0100_HEADER_PTR_OFFSET = 378
FILD0100_ORN_PTR_REL_OFFSET = 378
FILD0100_NAME_LEN = 10


@dataclass(frozen=True)
class JournalInfo:
    """JournalInfo record: (journal name, journal library)."""

    name: str
    library: str


def decode_fild0100_journal(col: Column | str, ccsid: int = 37) -> Column:
    """Decode the journal name/library out of a FILD0100 buffer by
    following the reference's offset chain
    (JournalInfoRetrieval.java:140-146):

    ``hdr = int32BE(buf, 378)``; ``orn = hdr + int32BE(buf, hdr+378)``;
    name = text10 at ``orn``, library = text10 at ``orn+10`` (both
    CCSID-decoded and right-trimmed, decodeString :402-406).

    Offsets are pure Catalyst (hex/conv arithmetic); the two text
    fields ride the C6 charset codec. Returns
    ``struct(journal_name string, journal_library string)``.
    """
    blob = F.col(col) if isinstance(col, str) else col
    hdr = _be_int32(blob, F.lit(FILD0100_HEADER_PTR_OFFSET))
    orn = hdr + _be_int32(blob, hdr + F.lit(FILD0100_ORN_PTR_REL_OFFSET))
    decode = charset_decode_udf(ccsid)
    name_b = F.substring(blob, orn + 1, FILD0100_NAME_LEN)
    lib_b = F.substring(blob, orn + 1 + FILD0100_NAME_LEN, FILD0100_NAME_LEN)
    return F.struct(
        F.rtrim(decode(name_b)).alias("journal_name"),
        F.rtrim(decode(lib_b)).alias("journal_library"),
    )


# JOURNAL_REGEX (JournalInfoRetrieval.java:73):
#   \/[^/]*\/([^.]*).LIB\/(.*).JRN  -> group1=library, group2=journal
_JOURNAL_PATH_RE = r"/[^/]*/([^.]*)\.LIB/(.*)\.JRN"


def parse_journal_path(path: str) -> JournalInfo:
    """Library-level discovery: parse a FileAttributes journal path
    ``/QSYS.LIB/<lib>.LIB/<jrn>.JRN`` (JournalInfoRetrieval.java:76-91).
    Raises like the reference ("Journal not found") on no match."""
    import re

    m = re.fullmatch(_JOURNAL_PATH_RE, path)
    if not m:
        raise RuntimeError(f"Journal not found: no match for {path!r}")
    return JournalInfo(name=m.group(2), library=m.group(1))


def journal_for_table(
    catalog: DataFrame, schema: str, table: str | None = None
) -> JournalInfo:
    """Resolve the journal for one table (or the library default when
    ``table`` is None), mirroring ``getJournal(as400, schema[, table])``.
    A table-level catalog row wins; otherwise the library-level row
    (``table_name IS NULL``) applies — the QSQJRN default journal
    convention. Raises when neither exists (reference:
    "Journal not found for schema.table")."""
    rows = (
        catalog.filter(F.col("library") == schema)
        .filter(
            F.col("table_name").isNull()
            if table is None
            else (
                F.col("table_name").isNull()
                | (F.col("table_name") == table)
            )
        )
        .select("table_name", "journal_name", "journal_library")
        .collect()  # bounded: at most 2 rows (table row + library row)
    )
    by_table = {r["table_name"]: r for r in rows}
    row = by_table.get(table) or by_table.get(None)
    if row is None:
        raise RuntimeError(f"Journal not found for {schema}.{table}")
    return JournalInfo(row["journal_name"], row["journal_library"])


def resolve_journal(
    catalog: DataFrame,
    schema: str,
    includes: list[tuple[str, str]] | None = None,
) -> JournalInfo:
    """Filter-list resolution (JournalInfoRetrieval.java:93-111):
    empty include list -> library-level journal; otherwise resolve
    each ``(schema, table)`` filter, assert the filter schemas match,
    and require the whole set to map to EXACTLY one journal."""
    if not includes:
        return journal_for_table(catalog, schema, None)
    infos = set()
    for f_schema, f_table in includes:
        if f_schema != schema:
            raise ValueError(
                f"schema {schema} does not match for filter: "
                f"({f_schema}, {f_table})"
            )
        infos.add(journal_for_table(catalog, schema, f_table))
    if len(infos) > 1:
        raise ValueError(
            "more than one journal for the set of tables journals: "
            f"{sorted((i.library, i.name) for i in infos)}"
        )
    return next(iter(infos))
