"""Registry of driver-contract queries: each entry pairs a PySpark
DataFrame builder with an equivalent DuckDB/ANSI SQL oracle, run by
the driver at sf0.01 (see __spark_entry__.py).

Every query realizes a SURVEY.md §2 operator (or a training-pipeline
op the 100 TB use-case needs) over the driver's testdata tables.
"""

from __future__ import annotations

from debezium_connector_ibmi_spark.queries import (
    cdc,
    corpusops,
    embeddingops,
    misc_ops,
    multimodalops,
    parity_ops,
    relational,
    textops,
)

_MODULES = (
    cdc, relational, textops, embeddingops, misc_ops, parity_ops,
    multimodalops, corpusops,
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
