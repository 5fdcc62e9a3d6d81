from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_journal,
    generate_pages,
)

__all__ = ["JournalGenConfig", "generate_journal", "generate_pages"]
