"""Iceberg binding of the MERGE sink interface (the production path).

``KeyBucketedTarget`` (merge.py) is the local parquet stand-in; this
class issues the real Iceberg SQL with identical semantics. It is
import-gated: the sandbox image has no Iceberg runtime jars, so the
constructor verifies the catalog and raises a clear error otherwise
(every statement below is standard public Iceberg-Spark SQL).

Semantic mapping (same contract as KeyBucketedTarget):

- table layout     -> ``CREATE TABLE ... PARTITIONED BY
                      (bucket(N, url))`` — bucket-pruned merges
- position merge   -> ``MERGE INTO t USING s ON t.url = s.url
                      WHEN MATCHED AND (s.receiver_idx, s.seq) >=
                      (t.receiver_idx, t.seq) THEN UPDATE/DELETE
                      WHEN NOT MATCHED AND s.op != 'd' THEN INSERT``
- batch-id fence   -> snapshot summary properties: every commit is
                      stamped ``wap.id``/custom ``cdc.batch_id``; the
                      fence reads the current snapshot's property
- watermark        -> table property ``cdc.watermark``
- schema evolution -> ``ALTER TABLE ADD COLUMN / DROP COLUMN /
                      ALTER COLUMN TYPE`` (metadata-only)
- exactly-once     -> Iceberg's atomic snapshot commit replaces the
                      ``_latest`` pointer flip
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergTarget:
    def __init__(
        self,
        spark: SparkSession,
        table: str,  # catalog.db.table
        key: str = "url",
        num_buckets: int = 512,
        delete_mode: str = "drop",
    ):
        self.spark = spark
        self.table = table
        self.key = key
        self.num_buckets = num_buckets
        self.delete_mode = delete_mode
        catalog = table.split(".")[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None or not impl.startswith("org.apache.iceberg."):
            raise RuntimeError(
                f"no Iceberg catalog '{catalog}' configured "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark."
                "SparkCatalog + iceberg-spark-runtime jar); use "
                "KeyBucketedTarget for the local parquet stand-in"
            )

    # -- DDL -----------------------------------------------------------

    def create(self, schema_ddl: str, merge_on_read: bool = True) -> None:
        props = (
            "'write.delete.mode'='merge-on-read',"
            "'write.update.mode'='merge-on-read',"
            "'write.merge.mode'='merge-on-read'"
            if merge_on_read
            else "'write.merge.mode'='copy-on-write'"
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.table} ({schema_ddl}) "
            f"USING iceberg "
            f"PARTITIONED BY (bucket({self.num_buckets}, {self.key})) "
            f"TBLPROPERTIES ({props})"
        )

    # -- fence / watermark ----------------------------------------------

    def last_batch_id(self) -> int:
        row = self.spark.sql(
            f"SELECT summary['cdc.batch_id'] AS b FROM "
            f"{self.table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["b"]) if row and row["b"] is not None else -1

    def watermark(self) -> tuple[int, int]:
        row = self.spark.sql(
            f"SELECT summary['cdc.watermark'] AS w FROM "
            f"{self.table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        if not row or row["w"] is None:
            return (-1, -1)
        r, s = row["w"].split(":")
        return (int(r), int(s))

    # -- merge --------------------------------------------------------------

    def merge(
        self,
        batch: DataFrame,
        batch_id: int,
        watermark: tuple[int, int] | None = None,
        partitions: list[dict] | None = None,
    ) -> dict:
        if batch_id <= self.last_batch_id():
            return {"skipped": True, "batch_id": batch_id}
        # stamp the commit for the fence (read back via .snapshots)
        self.spark.conf.set(
            "spark.wap.id", f"cdc-batch-{batch_id}"
        )
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES ("
            f"'cdc.batch_id'='{batch_id}'"
            + (
                f", 'cdc.watermark'='{watermark[0]}:{watermark[1]}'"
                if watermark
                else ""
            )
            + ")"
        )
        batch.createOrReplaceTempView("cdc_batch_src")
        pos_newer = (
            f"(s.receiver_idx > t.receiver_idx OR "
            f"(s.receiver_idx = t.receiver_idx AND s.seq >= t.seq))"
        )
        if self.delete_mode == "drop":
            matched = (
                f"WHEN MATCHED AND s.op = 'd' AND {pos_newer} THEN DELETE "
                f"WHEN MATCHED AND {pos_newer} THEN UPDATE SET * "
                f"WHEN NOT MATCHED AND s.op != 'd' THEN INSERT *"
            )
        else:
            matched = (
                f"WHEN MATCHED AND {pos_newer} THEN UPDATE SET * "
                f"WHEN NOT MATCHED THEN INSERT *"
            )
        self.spark.sql(
            f"MERGE INTO {self.table} t USING cdc_batch_src s "
            f"ON t.{self.key} = s.{self.key} {matched}"
        )
        return {"skipped": False, "batch_id": batch_id}

    # -- schema evolution -------------------------------------------------------

    def schema_version(self) -> int:
        v = self.spark.sql(
            f"SELECT summary['cdc.schema_version'] AS v FROM "
            f"{self.table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(v["v"]) if v and v["v"] is not None else -1

    def apply_column_change(self, change) -> None:
        """ColumnChange -> ALTER TABLE (metadata-only in Iceberg)."""
        if change.action == "add":
            self.spark.sql(
                f"ALTER TABLE {self.table} ADD COLUMN "
                f"{change.name} {change.dtype}"
            )
        elif change.action == "drop":
            self.spark.sql(f"ALTER TABLE {self.table} DROP COLUMN {change.name}")
        elif change.action == "widen":
            self.spark.sql(
                f"ALTER TABLE {self.table} ALTER COLUMN "
                f"{change.name} TYPE {change.dtype}"
            )
        else:
            raise ValueError(change.action)

    def read(self, buckets=None) -> DataFrame:
        return self.spark.table(self.table)
