from debezium_connector_ibmi_spark.sources.journal_source import (
    read_journal,
    read_journal_stream,
)

__all__ = ["read_journal", "read_journal_stream"]
