from debezium_connector_ibmi_spark.functions.decode import (
    extract_text_udf,
    scrub_control_chars,
    split_object_name,
)
from debezium_connector_ibmi_spark.functions.header_codec import (
    decode_header_udf,
    encode_header,
)
from debezium_connector_ibmi_spark.functions.names import (
    data_change_table_name,
    java_friendly_names,
    lowercase_all,
    to_camel_case,
)
from debezium_connector_ibmi_spark.functions.optype import (
    OP_MAP,
    is_data_entry,
    op_type_col,
)
from debezium_connector_ibmi_spark.functions.typeconv import (
    charset_decode_udf,
    decode_cyymmddhhmmss,
    parse_default_value,
    with_default,
)

__all__ = [
    "OP_MAP",
    "op_type_col",
    "is_data_entry",
    "extract_text_udf",
    "scrub_control_chars",
    "split_object_name",
    "decode_header_udf",
    "encode_header",
    "to_camel_case",
    "java_friendly_names",
    "lowercase_all",
    "data_change_table_name",
    "charset_decode_udf",
    "parse_default_value",
    "with_default",
    "decode_cyymmddhhmmss",
]
