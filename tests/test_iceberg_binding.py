"""The Iceberg binding is import-gated: without the runtime jars it
must fail fast with an actionable message (and never be silently
used)."""

from __future__ import annotations

import pytest

from debezium_connector_ibmi_spark.sinks.iceberg import IcebergTarget


def test_raises_without_iceberg_catalog(spark):
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergTarget(spark, "lake.db.pages")


def test_interface_parity():
    """The binding exposes the same surface as the local stand-in."""
    from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

    for method in ("merge", "read", "watermark", "last_batch_id", "schema_version"):
        assert hasattr(IcebergTarget, method)
        assert hasattr(KeyBucketedTarget, method)