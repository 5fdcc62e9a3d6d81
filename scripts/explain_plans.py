"""Dump ``.explain("formatted")`` for registry queries to text files.

Usage: python scripts/explain_plans.py OUT_DIR SUFFIX QUERY [QUERY ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query, using the sf dir
from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Run from the
tree whose plans you want (round-start worktree for "before", HEAD
for "after").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    from debezium_connector_ibmi_spark.queries import all_queries
    from debezium_connector_ibmi_spark.session import get_spark

    spark = get_spark(app_name="explain-plans", cores=8, shuffle_partitions=8)
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
