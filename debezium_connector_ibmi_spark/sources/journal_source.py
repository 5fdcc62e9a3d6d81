"""Journal (changelog) sources — batch and streaming (S1/S2).

The reference fetches journal blocks over an RPC into a byte buffer
(``RetrieveJournal.java:77-138``). Here the journal is a table:
- batch: ``spark.read.parquet`` with predicate/partition pruning
  standing in for the server-side range restriction;
- streaming: ``spark.readStream`` file source (micro-batch = newly
  arrived journal files, ``maxFilesPerTrigger`` = the buffer-size
  analogue). On a cluster this is the same code over an Iceberg
  table with incremental scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

JOURNAL_SCHEMA = T.StructType(
    [
        T.StructField("receiver", T.StringType()),
        T.StructField("receiver_idx", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("entry_ts", T.TimestampType()),
        T.StructField("journal_code", T.StringType()),
        T.StructField("entry_type", T.StringType()),
        T.StructField("commit_cycle", T.LongType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("before_html", T.BinaryType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("null_mask", T.ArrayType(T.BooleanType())),
    ]
)


def read_journal(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(JOURNAL_SCHEMA).parquet(path)


def read_journal_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(JOURNAL_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
