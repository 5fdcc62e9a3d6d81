from debezium_connector_ibmi_spark.streaming.engine import (
    JournalTailer,
    run_structured_stream,
)
from debezium_connector_ibmi_spark.streaming.signals import SignalProcessor

__all__ = ["JournalTailer", "run_structured_stream", "SignalProcessor"]
