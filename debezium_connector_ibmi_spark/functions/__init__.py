from debezium_connector_ibmi_spark.functions.optype import (
    OP_MAP,
    op_type_col,
    is_data_entry,
)
from debezium_connector_ibmi_spark.functions.decode import (
    extract_text_udf,
    scrub_control_chars,
)

__all__ = [
    "OP_MAP",
    "op_type_col",
    "is_data_entry",
    "extract_text_udf",
    "scrub_control_chars",
]
