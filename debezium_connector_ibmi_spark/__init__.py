"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``jhc-systems/debezium-connector-ibmi`` (an IBM i / DB2-for-i journal
CDC source connector) as an idiomatic PySpark engine:

- the IBM i *journal* (system WAL) becomes a partitioned changelog
  table tailed with Structured Streaming;
- binary journal-entry decode becomes a vectorized Arrow ``pandas_udf``;
- the Debezium envelope / Kafka sink becomes a url-keyed MERGE upsert
  into a lake table with exactly-once semantics (batch-id fence +
  per-partition high-watermark lineage);
- `(receiver, sequence)` position tracking, receiver-chain pagination,
  before/after-image pairing, commit-cycle transaction grouping, and
  schema evolution are re-expressed with DataFrame windows, a driver
  side range planner, and ordered schema updates.

Nothing here is a port: the reference is row-at-a-time Java
(see SURVEY.md for file:line citations); this engine is columnar,
declarative, and Catalyst-optimized.
"""

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
