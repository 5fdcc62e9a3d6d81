"""Hot-gram skew stress for the substring-dedup family (round 7,
VERDICT r6 #1 done-criterion).

The scale hazard substring dedup exists for: corpus boilerplate — ONE
exact 8-gram (cookie banner, nav chrome) owning a large fraction of
all window sites. The round-6 ``count(*) over (partition by gram)``
window shipped every site of that gram to one WindowExec task; the
round-7 shape collapses it map-side (groupBy partial agg) and joins
the dup-gram stats back broadcast, so no site row is ever exchanged.

This stress builds two same-shape corpora:
- control: every doc is salted-unique tokens (no corpus-wide dups);
- hot: identical, except a fixed 8-token boilerplate block is
  spliced into every doc often enough that the ONE hot gram owns
  ~5% of all window sites corpus-wide.

Bounded-skew criterion: hot wall / control wall stays a small
constant (the hot corpus does strictly more work — dup sites exist,
spans merge per doc — but no single-task serialization on the hot
gram). Also runs the hot corpus through stats_join="shuffle" (the
dup-gram-stats-outgrow-memory regime) to show the AQE-skew-join path
stays bounded too.

Usage: python scripts/bench_substring_skew.py [n_docs] [tokens_per_doc]
(defaults 20000 x 400 ≈ 8M sites, hot gram ≈ 5%). Prints one line per
cell; append results to BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from debezium_connector_ibmi_spark.operators import substring_dedup as sd  # noqa: E402
from debezium_connector_ibmi_spark.session import get_spark  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = f"/dev/shm/sskew_{os.getpid()}"

HOT_BLOCK = " ".join(f"hot{i}" for i in range(8))


def make_corpus(spark, hot: bool):
    """Deterministic corpus: per doc, TOKENS salted-unique tokens;
    hot mode splices the 8-token boilerplate block every 20 tokens
    (sequence positions), putting the one exact hot 8-gram at ~5% of
    all sites (1 full-block site per 20 salt tokens; block-boundary
    grams mix with doc-unique salt so only the block's own gram is
    corpus-hot)."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    salt = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda i: F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"), i)),
            1,
            8,
        ),
    )
    if not hot:
        text = F.array_join(salt, " ")
    else:
        # splice the block after every 20th salt token
        chunks = F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS // 20 - 1)),
            lambda j: F.concat(
                F.array_join(F.slice(salt, j * 20 + 1, 20), " "),
                F.lit(" " + HOT_BLOCK),
            ),
        )
        text = F.array_join(chunks, " ")
    return base.select("doc_id", text.alias("text")).repartition(CPUS)


def legacy_window_dup_spans(corpus, k=8):
    """The round-6 shape, reconstructed for the A/B: count/min over a
    gram-partitioned WINDOW — every site of the hot gram ships to one
    WindowExec task and is buffered there."""
    from pyspark.sql import Window

    sites = sd.window_sites(corpus, k)
    w = Window.partitionBy("gram")
    first = F.min(F.struct("doc_id", "pos")).over(w)
    dup = (
        sites.select(
            "doc_id",
            "pos",
            F.count("*").over(w).alias("n_sites"),
            (
                (F.col("doc_id") == first["doc_id"])
                & (F.col("pos") == first["pos"])
            ).alias("is_first_site"),
        )
        .where(F.col("n_sites") >= 2)
    )
    return sd._merge_spans(dup, k).select(
        "doc_id", "span_start", "span_end", "n_windows"
    )


def make_superhot(spark):
    """The asymptotic hazard corpus, scaled down: ONE exact 8-gram
    owns ~all sites. Every doc is a unique 8-token prefix followed by
    the single token "h" repeated, so the only corpus-wide duplicated
    gram is "h h h h h h h h" with N_DOCS x (TOKENS-15) sites — the
    single-WindowExec-task regime a boilerplate gram creates at
    10^8-10^9 occurrences (Lee et al.'s corpora), at 10^6-10^7 here."""
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    prefix = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit("p"), i)
                ),
                1,
                8,
            ),
        ),
        " ",
    )
    body = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(TOKENS - 8)), lambda i: F.lit("h")),
        " ",
    )
    return base.select(
        "doc_id", F.concat(prefix, F.lit(" "), body).alias("text")
    ).repartition(CPUS)


def main():
    spark = get_spark(
        app_name="substring-skew", cores=CPUS, shuffle_partitions=CPUS
    )
    spark.range(1000).agg(F.sum("id")).collect()
    for label, hot, stats_join in (
        ("control", False, "broadcast"),
        ("hot5pct", True, "broadcast"),
        ("hot5pct-shuffle", True, "shuffle"),
        ("hot5pct-window-legacy", True, "window"),
        ("superhot", "super", "broadcast"),
        ("superhot-shuffle", "super", "shuffle"),
        ("superhot-window-legacy", "super", "window"),
    ):
        corpus = (
            make_superhot(spark) if hot == "super" else make_corpus(spark, hot)
        )
        # site accounting for the header line
        sites = sd.window_sites(corpus, k=8)
        n_sites = sites.count()
        hot_gram = " ".join(["h"] * 8) if hot == "super" else HOT_BLOCK
        n_hot = sites.where(F.col("gram") == hot_gram).count() if hot else 0
        spark.sparkContext.setJobDescription(f"sskew/{label}")
        t0 = time.time()
        if stats_join == "window":
            n_spans = legacy_window_dup_spans(corpus, 8)
        elif stats_join == "broadcast":
            n_spans = sd.dup_spans(corpus, k=8)
        else:
            n_spans = sd._merge_spans(
                sd.dup_window_sites(corpus, k=8, stats_join="shuffle"), 8
            ).select("doc_id", "span_start", "span_end", "n_windows")
        n = n_spans.count()
        wall = time.time() - t0
        print(
            f"{label}: {wall:.2f}s wall, {n} spans, {n_sites} sites"
            + (f", hot gram {n_hot} sites ({100.0*n_hot/n_sites:.1f}%)"
               if hot else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
