from debezium_connector_ibmi_spark.streaming.engine import JournalTailer

__all__ = ["JournalTailer"]
