"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship changelog materialization on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-pipeline ops; oracles are exact
DuckDB SQL equivalents (column names aliased identically).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_connector_ibmi_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC changelog materialization (last-writer-wins per
    key, deletes dropped) on the sf0.001 events table."""
    qs = all_queries()
    return qs["cdc_changelog_materialize"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
