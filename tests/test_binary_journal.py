"""C1 end-to-end: journal with packed binary headers -> vectorized
decode -> identical engine results."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.datagen.journal import (
    JournalGenConfig,
    generate_journal,
)
from debezium_connector_ibmi_spark.pipeline import current_state
from debezium_connector_ibmi_spark.sources.journal_source import (
    from_binary_journal,
    to_binary_journal,
)
from debezium_connector_ibmi_spark.testing import state_df_to_dict

GEN = JournalGenConfig(n_urls=30, n_ops=300, txn_size=20, receiver_rotation=60)

FIELDS = [
    "receiver_idx",
    "seq",
    "entry_ts",
    "journal_code",
    "entry_type",
    "table_name",
    "url",
]


def test_header_roundtrip_fields(spark):
    j = generate_journal(spark, GEN).cache()
    back = from_binary_journal(to_binary_journal(j))
    a = sorted(map(tuple, j.select(*FIELDS).collect()))
    b = sorted(map(tuple, back.select(*FIELDS).collect()))
    assert a == b
    # commit cycles survive for R and C entries
    ac = sorted(
        map(
            tuple,
            j.filter(F.col("journal_code").isin("R", "C"))
            .select("receiver_idx", "seq", "commit_cycle")
            .collect(),
        )
    )
    bc = sorted(
        map(
            tuple,
            back.filter(F.col("journal_code").isin("R", "C"))
            .select("receiver_idx", "seq", "commit_cycle")
            .collect(),
        )
    )
    assert ac == bc
    j.unpersist()


def test_state_equivalent_via_binary_path(spark):
    cfg = EngineConfig()
    j = generate_journal(spark, GEN).cache()
    direct = state_df_to_dict(current_state(j, cfg))
    via_binary = state_df_to_dict(
        current_state(from_binary_journal(to_binary_journal(j)), cfg)
    )
    assert direct == via_binary
    j.unpersist()