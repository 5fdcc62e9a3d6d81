from debezium_connector_ibmi_spark.plans.range_planner import (
    PositionRange,
    plan_next_range,
    receiver_lineage,
)

__all__ = ["PositionRange", "plan_next_range", "receiver_lineage"]
