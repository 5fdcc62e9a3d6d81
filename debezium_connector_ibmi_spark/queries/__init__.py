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

# Order matters: the driver's correctness harness verifies at most 50
# queries per round in registry-iteration order. Modules whose queries
# are new or changed this round go FIRST so every one of them gets a
# driver-verified row; the tail (relational beyond its first entry,
# embeddingops, misc_ops) rotates out only when unchanged AND already
# green in a retained CORRECTNESS_r* file.
_MODULES = (
    corpusops, multimodalops, textops, parity_ops, cdc, relational,
    embeddingops, misc_ops,
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
