"""Schema evolution (operator T12) — Debezium schema-history
semantics re-expressed as ordered target-table schema updates.

Reference behavior: on journal ``D.CG``/``D.CT`` entries the
connector clears its schema cache and refetches the table structure
at runtime (``As400StreamingChangeEventSource.java:243-248``,
``As400DatabaseSchema.java:57-67,95-116``) because the journal does
not describe DDL (README.md:111). Our synthetic journal tags CG
entries with ``table@vN``; the engine consults an
:class:`EvolutionSpec` (the schema-history analogue) and applies the
version's column changes to the target *in journal order, exactly
once* (applied version recorded in the sink commit — resume across an
evolution replays it idempotently).

On Iceberg this maps 1:1 to ``ALTER TABLE ADD COLUMN / DROP COLUMN /
ALTER COLUMN TYPE`` (metadata-only); the local parquet stand-in
rewrites the state with the new shape.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnChange:
    action: str  # "add" | "drop" | "widen"
    name: str
    dtype: str | None = None  # spark type string for add/widen
    default: object | None = None  # literal default for add


@dataclass(frozen=True)
class SchemaUpdate:
    version: int
    changes: tuple[ColumnChange, ...]


@dataclass
class EvolutionSpec:
    """Ordered schema history: version -> column changes."""

    updates: dict[int, SchemaUpdate] = field(default_factory=dict)

    @staticmethod
    def parse_version(table_name: str) -> int | None:
        """``PAGES@v3`` -> 3 (None when untagged)."""
        m = re.search(r"@v(\d+)$", table_name or "")
        return int(m.group(1)) if m else None

    def transform(self, df, version: int):
        """Apply one version's changes to a state DataFrame."""
        upd = self.updates.get(version)
        if upd is None:
            return df
        for ch in upd.changes:
            if ch.action == "add":
                if ch.name not in df.columns:
                    df = df.withColumn(
                        ch.name, F.lit(ch.default).cast(ch.dtype)
                    )
            elif ch.action == "drop":
                if ch.name in df.columns:
                    df = df.drop(ch.name)
            elif ch.action == "widen":
                df = df.withColumn(ch.name, F.col(ch.name).cast(ch.dtype))
            else:
                raise ValueError(f"unknown schema change action {ch.action}")
        return df


def apply_schema_events(target, spec: EvolutionSpec, versions: list[int]) -> list[int]:
    """Apply pending schema versions to the sink, in order, exactly
    once (versions <= the sink's recorded schema_version are skipped).
    Returns the versions actually applied."""
    applied = []
    for v in sorted(versions):
        if v <= target.schema_version():
            continue
        target.update_schema(lambda df, v=v: spec.transform(df, v), version=v)
        applied.append(v)
    return applied
