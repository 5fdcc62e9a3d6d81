"""Journal-entry code -> op-type mapping (operator C4).

Reference: ``journal-parsing/.../JournalEntryType.java:6-42`` maps
``"<code>.<type>"`` strings (e.g. ``"R.PT"``) to an enum; the
streaming source switches on it
(``As400StreamingChangeEventSource.java:186-321``).

Here the map is a Catalyst ``when`` chain over two columns — JVM-side,
codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "<journal_code>.<entry_type>" -> canonical op, mirroring
# JournalEntryType.java:6-42 (ADD_ROW2/AFTER_IMAGE/DELETE_ROW2/...)
OP_MAP: dict[str, str] = {
    "R.PT": "c",  # add row (insert)
    "R.PX": "c",  # add row, direct insert
    "R.UP": "u",  # after-image of update
    "R.UB": "b",  # before-image of update (consumed by pairing)
    "R.DL": "d",  # delete
    "R.DR": "d",  # delete rolled back variant treated as delete
    "C.SC": "txn_begin",  # start commit
    "C.CM": "txn_end",  # end commit
    "D.CT": "schema_create",  # file created
    "D.CG": "schema_change",  # file changed
    "F.OP": "noop",  # member opened — ignored (F4)
    "F.CL": "noop",  # member closed — ignored (F4)
}

_DATA_OPS = ("c", "u", "d")


def op_type_col(
    journal_code: Column | str = "journal_code",
    entry_type: Column | str = "entry_type",
) -> Column:
    """Column expression computing the canonical op code.

    Unknown combinations map to 'unknown' (the reference logs and
    skips them, As400StreamingChangeEventSource.java:316-319).
    """
    code = F.col(journal_code) if isinstance(journal_code, str) else journal_code
    etype = F.col(entry_type) if isinstance(entry_type, str) else entry_type
    key = F.concat_ws(".", code, etype)
    expr = None
    for k, v in OP_MAP.items():
        cond = key == k
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit("unknown"))


def is_data_entry(op: Column | str = "op") -> Column:
    """True for row-image ops that reach the MERGE (c/u/d)."""
    c = F.col(op) if isinstance(op, str) else op
    return c.isin(*_DATA_OPS)
