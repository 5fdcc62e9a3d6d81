from debezium_connector_ibmi_spark.sinks.merge import KeyBucketedTarget

__all__ = ["KeyBucketedTarget"]
