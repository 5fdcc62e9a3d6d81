from debezium_connector_ibmi_spark.operators.filters import (
    apply_standard_filters,
    resume_filter,
)
from debezium_connector_ibmi_spark.operators.pairing import pair_before_after
from debezium_connector_ibmi_spark.operators.compaction import (
    last_event_per_key,
    salted_last_event_per_key,
)
from debezium_connector_ibmi_spark.operators.envelope import to_change_envelope

__all__ = [
    "apply_standard_filters",
    "resume_filter",
    "pair_before_after",
    "last_event_per_key",
    "salted_last_event_per_key",
    "to_change_envelope",
]
