"""Exact substring-level dedup: duplicated k-token span detection
and removal (the Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" exact-substring family — the one dedup axis
MinHash/SimHash/SemDeDup don't cover: *partial* overlap, boilerplate
and quoted passages shared between otherwise-distinct documents).

The published recipe builds a corpus-wide suffix array; that is a
single-machine shape. The Spark-first equivalent is window-grained:
a *site* is one k-token window at (doc_id, pos); a window is
duplicated when its exact k-gram occurs at >= min_sites sites
corpus-wide. Duplicated windows merged per doc (overlap-merge) are
the maximal duplicated spans — for fixed-length windows this finds
exactly the spans a suffix array would flag at >= k tokens, with
span boundaries quantized to token positions (no mid-token splits).

Scale shape (the 100 TB plan):
- one map-side pass builds all windows per doc as a Catalyst
  ``transform`` over ``sequence`` (no per-token explode of the
  corpus; the explode is of the already-built gram array);
- ONE shuffle groups sites by gram (partial/map-side count agg);
  the join-back of dup grams reuses that hash partitioning, so the
  whole detection is a single exchange of the site relation;
- hot grams (corpus boilerplate repeated millions of times) are
  *count-aggregated*, never pair-expanded — there is no quadratic
  blowup on popular substrings, unlike pairwise dedup. AQE skew
  handling covers the join-back residual;
- span merge and text rebuild are per-doc window functions and
  higher-order array ops — no further corpus-wide shuffle.
- grams travel as full strings so the semantics are exact and the
  DuckDB oracle can replay them; at 10^10+ windows swap the group
  key to ``xxhash64(gram)`` (64-bit, ~n^2/2^65 collision odds) to
  cut shuffle bytes — the plan is otherwise identical.

Reference analogue: none (the connector has no text dedup); this is
a first-class training-pipeline operator per the project brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 8


def window_sites(
    df: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All k-token window sites: (id, pos, gram), pos = 0-based token
    index of the window start. Docs shorter than k tokens contribute
    no sites. Map-only (whole-stage codegen: split/transform/slice/
    posexplode), no shuffle."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # the when-guard makes the expression TOTAL, not just filtered:
    # InferFiltersFromGenerate re-evaluates the gram array as a
    # size()>0 predicate on every row, ahead of the n>=k filter —
    # unguarded, sequence(0, n-k) turns descending on short docs and
    # slice() throws on start 0 (CaseWhen branches evaluate lazily)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.where(n >= k)
        .select(F.col(id_col).alias("doc_id"), grams.alias("_grams"))
        .select("doc_id", F.posexplode("_grams").alias("pos", "gram"))
    )


def dup_window_sites(
    df: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sites whose gram occurs at >= min_sites sites corpus-wide:
    (doc_id, pos, n_sites, is_first_site). ``is_first_site`` marks
    the globally-first site of each duplicate gram (min (doc_id,
    pos)) — the copy "keep one occurrence" policies retain.

    ONE shuffle and ONE site-relation build: count/min over a
    gram-partitioned window instead of groupBy + join-back (the two
    branches of the join shape each rebuilt the sites — the exchange
    subtrees differ (one carries the partial agg), so Catalyst's
    ReuseExchange never fires and the map-side gram build ran
    twice). A hot boilerplate gram routes to one window group the
    same way it would route to one join partition — no worse skew —
    and WindowExec spills its group buffer, so there is still no
    pairwise expansion on popular substrings."""
    sites = window_sites(df, k, id_col, text_col)
    w = Window.partitionBy("gram")
    first = F.min(F.struct("doc_id", "pos")).over(w)
    return (
        sites.select(
            "doc_id",
            "pos",
            F.count("*").over(w).alias("n_sites"),
            (
                (F.col("doc_id") == first["doc_id"])
                & (F.col("pos") == first["pos"])
            ).alias("is_first_site"),
        )
        .where(F.col("n_sites") >= min_sites)
    )


def _merge_spans(sites: DataFrame, k: int) -> DataFrame:
    """Overlap-merge fixed-length-k window sites per doc into maximal
    spans (gaps-and-islands). Two windows [p, p+k-1], [q, q+k-1] with
    p <= q merge iff q <= p + k (adjacent-or-overlapping). Per-doc
    window functions only — partitioned by doc, no corpus shuffle."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = sites.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            1,
        ).otherwise(0),
    ).withColumn(
        "_span",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "_span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        F.count("*").alias("n_windows"),
    )


def dup_spans(
    df: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_first_site: bool = False,
) -> DataFrame:
    """Maximal duplicated spans per doc: (doc_id, span_start,
    span_end, n_windows), token-index inclusive bounds. With
    drop_first_site=True the globally-first window of each duplicate
    gram is exempt (keep-one-copy view)."""
    sites = dup_window_sites(df, k, min_sites, id_col, text_col)
    if drop_first_site:
        sites = sites.where(~F.col("is_first_site"))
    return _merge_spans(sites, k).select(
        "doc_id", "span_start", "span_end", "n_windows"
    )


def dup_token_fraction(
    df: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-token budget: (doc_id, n_tokens,
    dup_tokens, dup_frac). Every doc appears, including dup-free and
    shorter-than-k docs (0 / 0.0). The standard corpus-quality
    metric gating "how much of my 100 TB is boilerplate"."""
    spans = dup_spans(df, k, min_sites, id_col, text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "dup_tokens"
        )
    )
    toks = F.size(F.split(F.col(text_col), " "))
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens").cast("double")
            ).alias("dup_frac"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
) -> DataFrame:
    """Keep-one-copy substring dedup: drop every token covered by a
    duplicated window whose site is NOT the globally-first site of
    its gram, then re-join the surviving tokens with single spaces.
    The first occurrence of each duplicated passage survives in
    place; later occurrences are excised (Lee et al.'s policy at
    window granularity). Adds ``out_col`` next to the input columns.

    Covered positions are collected per doc (one agg shuffle of the
    *dup sites only*, a tiny relation vs the corpus) and the rebuild
    is a higher-order filter over the token array — token membership
    probes an ``array_contains`` per token; for typical web docs
    (10^3 tokens, dup coverage << doc) this is cheap and stays in
    codegen; a sorted-merge rebuild is the fallback if profiles ever
    show it hot."""
    removed = dup_window_sites(df, k, min_sites, id_col, text_col).where(
        ~F.col("is_first_site")
    )
    covered = (
        removed.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("_cov"))
        # covered derives from df: rename the key so the re-join is
        # not an ambiguous self-reference
        .withColumnRenamed("doc_id", "_cov_id")
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.coalesce(
            F.array_contains(F.col("_cov"), s["i"]), F.lit(False)
        ),
    )
    out = (
        df.join(covered, F.col(id_col) == F.col("_cov_id"), "left")
        .drop("_cov_id")
        .withColumn(
            out_col,
            F.concat_ws(" ", F.transform(kept, lambda s: s["t"])),
        )
        .drop("_cov")
    )
    return out


# -- incremental mode: dedup a new crawl batch against a gram index --
# The dedup-on-ingest story for the substring family: at 100 TB the
# corpus is never re-windowed per crawl. The corpus is summarized
# ONCE into an additive gram-stats relation (gram -> site count +
# first site); each incoming batch joins its OWN grams against it.
# Contract (pinned by tests + the driver oracle): incremental over
# batch B with index(C) == the batch operators over C UNION B
# restricted to B's docs — exactly, because total site count is
# n_C + n_B and the global first site is the corpus one whenever the
# gram was ever seen (corpus sites precede batch sites in time).
#
# Scale shape: gram_stats is one count/min agg (same single-shuffle
# contract as detection); the per-batch join touches index rows only
# for grams IN THE BATCH — persist the index bucketed by gram (e.g.
# through the key-bucketed MERGE sink keyed on gram) and only the
# batch side shuffles; for small batches, broadcasting the batch's
# gram stats turns the index probe into a map-side scan. The merge
# of new stats into the index is additive and associative
# (sum / min-struct), so it composes with any upsert store.


def gram_stats(
    df: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Additive gram index relation: (gram, n_sites, first_doc,
    first_pos). ONE count/min agg over the window sites."""
    return (
        window_sites(df, k, id_col, text_col)
        .groupBy("gram")
        .agg(
            F.count("*").alias("n_sites"),
            F.min(F.struct("doc_id", "pos")).alias("_first"),
        )
        .select(
            "gram",
            "n_sites",
            F.col("_first.doc_id").alias("first_doc"),
            F.col("_first.pos").alias("first_pos"),
        )
    )


def merge_gram_stats(index: DataFrame, new: DataFrame) -> DataFrame:
    """Fold a batch's gram stats into the index (sum counts, keep the
    earliest first site). Associative — safe to apply per batch in
    any grouping."""
    return (
        index.unionByName(new)
        .groupBy("gram")
        .agg(
            F.sum("n_sites").alias("n_sites"),
            F.min(F.struct(F.col("first_doc").alias("doc_id"),
                           F.col("first_pos").alias("pos"))).alias("_f"),
        )
        .select(
            "gram",
            "n_sites",
            F.col("_f.doc_id").alias("first_doc"),
            F.col("_f.pos").alias("first_pos"),
        )
    )


def dup_window_sites_incremental(
    batch: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batch sites duplicated against corpus-index + batch-internal
    occurrences: (doc_id, pos, n_sites, is_first_site). n_sites is
    the corpus+batch total; is_first_site is True only for the min
    batch site of a gram the corpus has NEVER seen (a corpus hit
    always owns the first site)."""
    sites = window_sites(batch, k, id_col, text_col)
    # same one-build window shape as dup_window_sites: batch-internal
    # count/first over a gram window, then ONE left join against the
    # index — the window leaves the sites hash-partitioned by gram,
    # so the index probe reuses that partitioning
    w = Window.partitionBy("gram")
    first_b = F.min(F.struct("doc_id", "pos")).over(w)
    enriched = sites.select(
        "gram",
        "doc_id",
        "pos",
        F.count("*").over(w).alias("_n_b"),
        (
            (F.col("doc_id") == first_b["doc_id"])
            & (F.col("pos") == first_b["pos"])
        ).alias("_is_first_b"),
    )
    idx = index.select("gram", F.col("n_sites").alias("_n_c"))
    return (
        enriched.join(idx, "gram", "left")
        .withColumn("_n_c", F.coalesce("_n_c", F.lit(0)))
        .where(F.col("_n_b") + F.col("_n_c") >= min_sites)
        .select(
            "doc_id",
            "pos",
            (F.col("_n_b") + F.col("_n_c")).alias("n_sites"),
            ((F.col("_n_c") == 0) & F.col("_is_first_b")).alias(
                "is_first_site"
            ),
        )
    )


def dup_spans_incremental(
    batch: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_first_site: bool = False,
) -> DataFrame:
    """Maximal duplicated spans of the batch docs vs corpus+batch."""
    sites = dup_window_sites_incremental(
        batch, index, k, min_sites, id_col, text_col
    )
    if drop_first_site:
        sites = sites.where(~F.col("is_first_site"))
    return _merge_spans(sites, k).select(
        "doc_id", "span_start", "span_end", "n_windows"
    )


def remove_dup_spans_incremental(
    batch: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_K,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
) -> DataFrame:
    """Keep-one-copy removal for an incoming batch: tokens covered by
    windows whose gram the corpus already holds (or a batch-earlier
    site holds) are excised; a gram's first-ever site keeps its
    copy."""
    removed = dup_window_sites_incremental(
        batch, index, k, min_sites, id_col, text_col
    ).where(~F.col("is_first_site"))
    covered = (
        removed.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("_cov"))
        .withColumnRenamed("doc_id", "_cov_id")
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.coalesce(
            F.array_contains(F.col("_cov"), s["i"]), F.lit(False)
        ),
    )
    return (
        batch.join(covered, F.col(id_col) == F.col("_cov_id"), "left")
        .drop("_cov_id")
        .withColumn(
            out_col,
            F.concat_ws(" ", F.transform(kept, lambda s: s["t"])),
        )
        .drop("_cov")
    )
