"""Name/rename transforms — the reference's SMT collection and topic
naming re-expressed as DataFrame/naming functions.

- C13 camelize: ``RepackageJavaFriendlySchemaRenamer.toCamelCase``
  (smt/RepackageJavaFriendlySchemaRenamer.java:148-176)
- F9 schema rename: same SMT's schema rewrite (java-friendly
  ``package.CamelCaseTable{Key,Value}`` names), here a column-rename
  projection (:88-196)
- F10 lowercase-all: ``kafka-smt-collection/.../LowerCaseAll.java``
- F11/S9 topic naming: ``HostnamePrefixNamingScheme.dataChangeTopic``
  (``prefix.schema.table``) and the sink re-prefixer
  (LowerCaseTopicRePrefixSink.java:19-62) — target-table naming.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def to_camel_case(name: str) -> str:
    """``a_b-c 1x`` -> ``ABC1x`` — split on non-alphanumerics,
    capitalize each part's first letter (reference semantics:
    delimiters removed, parts title-cased, digits preserved)."""
    parts = [p for p in re.split(r"[^A-Za-z0-9]+", name) if p]
    return "".join(p[:1].upper() + p[1:] for p in parts)


def java_friendly_names(
    df: DataFrame, package: str = "com.example.cdc", table: str = ""
) -> tuple[str, DataFrame]:
    """F9: java-friendly schema name + CamelCase column rename."""
    schema_name = f"{package}.{to_camel_case(table)}Value" if table else package
    mapping = {c: to_camel_case(c) for c in df.columns}
    return schema_name, df.withColumnsRenamed(mapping)


def lowercase_all(df: DataFrame) -> DataFrame:
    """F10: lowercase every column name."""
    return df.toDF(*[c.lower() for c in df.columns])


def data_change_table_name(prefix: str, schema: str, table: str) -> str:
    """S9: ``prefix.schema.table`` (HostnamePrefixNamingScheme
    semantics; prefix defaults to hostname in the reference)."""
    return ".".join(p for p in (prefix, schema, table) if p)


def reprefix_table_name(name: str, old_prefix: str, new_prefix: str) -> str:
    """F11: strip old prefix, lowercase, re-prefix (sink-side
    LowerCaseTopicRePrefixSink semantics)."""
    rest = name[len(old_prefix):] if name.startswith(old_prefix) else name
    rest = rest.lstrip(".").lower()
    return f"{new_prefix}.{rest}" if new_prefix else rest
