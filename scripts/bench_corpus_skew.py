"""Skew stress for the corpus-pipeline operators (the dedup analogue
of BASELINE.md's CDC hot-key table): a synthetic duplicate-heavy
corpus where ONE text owns ~5% of all documents (the pathological
boilerplate page every web crawl has), another 25% spread over 1k
duplicate templates, 70% unique. Exact dedup, chunk-level dedup and
minhash signatures must stay flat under this skew because they are
all map-side-partial hash aggregations (or map-only projections) —
a window/sort shape would serialize the hot fingerprint's partition.

Usage: python scripts/bench_corpus_skew.py [n_docs] [out_md]
Appends a markdown section to out_md when given.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def make_corpus(spark, n_docs: int):
    """doc_id + ~40-word text; dedup structure via doc_id arithmetic:
    5% one hot text, 25% over 1k templates, 70% unique."""
    base = " ".join(f"tok{i}" for i in range(36))
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    bucket = F.pmod(F.col("doc_id"), F.lit(100))
    group = (
        F.when(bucket < 5, F.lit(0))  # 5% hot
        .when(bucket < 30, F.pmod(F.col("doc_id"), F.lit(1000)) + 1)  # dups
        .otherwise(-F.col("doc_id") - 1)  # unique
    )
    text = F.concat(F.lit(base + " g"), group.cast("string"))
    return d.select("doc_id", text.alias("text"))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else None

    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        chunk_dedup_stats,
    )
    from debezium_connector_ibmi_spark.operators.text_analysis import (
        exact_dedup,
        with_minhash,
    )
    from debezium_connector_ibmi_spark.session import get_spark

    spark = get_spark(app_name="corpus-skew", cores=32, shuffle_partitions=64)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    corpus = make_corpus(spark, n_docs).persist()
    corpus.count()

    results = {}

    t0 = time.time()
    n_keep = exact_dedup(corpus).count()
    results["exact_dedup"] = {
        "sec": round(time.time() - t0, 2),
        "rows_out": n_keep,
    }

    t0 = time.time()
    agg = chunk_dedup_stats(corpus, chunk_size=20).agg(
        F.sum("n_chunks").alias("n"), F.sum("n_dup_chunks").alias("d")
    ).first()
    results["chunk_dedup"] = {
        "sec": round(time.time() - t0, 2),
        "chunks": int(agg["n"]),
        "dup_chunks": int(agg["d"]),
    }

    t0 = time.time()
    with_minhash(corpus, n_hashes=4, n=3).select(
        F.count(F.lit(1))
    ).collect()
    results["minhash_signature"] = {"sec": round(time.time() - t0, 2)}

    line = {
        "n_docs": n_docs,
        "hot_share_pct": 5,
        "docs_per_sec": {
            k: round(n_docs / v["sec"]) for k, v in results.items()
        },
        "detail": results,
    }
    print(json.dumps(line))

    if out_md:
        with open(out_md, "a") as fh:
            fh.write(
                f"\n### Corpus skew stress (n_docs={n_docs}, one text = 5% "
                f"of corpus, 25% over 1k templates, local[32])\n\n"
                f"| op | sec | docs/s | note |\n|---|---|---|---|\n"
            )
            e = results["exact_dedup"]
            fh.write(
                f"| exact_dedup | {e['sec']} | {round(n_docs/e['sec'])} |"
                f" {e['rows_out']} survivors |\n"
            )
            c = results["chunk_dedup"]
            fh.write(
                f"| chunk_dedup_stats | {c['sec']} |"
                f" {round(n_docs/c['sec'])} | {c['chunks']} chunks,"
                f" {c['dup_chunks']} dups |\n"
            )
            m = results["minhash_signature"]
            fh.write(
                f"| with_minhash (4 sigs) | {m['sec']} |"
                f" {round(n_docs/m['sec'])} | map-only |\n"
            )


if __name__ == "__main__":
    main()
