"""Duplicate clustering: connected components over a near-duplicate
graph + representative selection — the step a training-data dedup
pipeline runs AFTER pair detection (exact + MinHash/LSH near-dups
produce PAIRS; keeping one document per duplicate CLUSTER requires the
transitive closure: A~B, B~C => {A,B,C} is one cluster even when A~C
was never emitted).

Scale shape: min-label propagation as iterative DataFrame joins —
labels start as each node's own id; every round each node takes the
min of its own label and its neighbors' labels; converged when no
label changes. Each round is one shuffle-join plus one aggregation on
the EDGE relation (never materializing anything super-linear). For
dedup graphs components are tiny (a duplicate cluster is a handful of
docs) so this converges in 2-4 rounds. Pathological HIGH-DIAMETER
graphs (paths, chord-merged chains — not dedup shapes, but the
operator must not break on them) fall back after
``propagation_rounds`` to alternating **large-star / small-star
contraction** (Kiveris et al., "Connected Components in MapReduce and
Beyond"): each pass rewrites the edge list so every node connects to
the minimum of its neighborhood, provably converging to star graphs
in O(log^2 n) passes on ANY graph — a 1000-node path needs ~13 passes
where plain propagation needs 999. (A pointer-jumping variant was
tried first and rejected: the label-table self-join re-enters the
just-checkpointed plan twice and Spark's plan bookkeeping grows
exponentially with rounds — star contraction keeps every pass a
single dependency chain over one checkpointed edge relation.)
Convergence is one scalar action per round (count / fingerprint agg),
never a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """Large-star: every node's strictly-larger neighbors connect to
    the minimum of its closed neighborhood. ``sym`` must contain both
    orientations of every edge."""
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select("a", F.least("mb", "a").alias("m"))
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient edges high->low; every node and its smaller
    neighbors connect to the minimum of that down-neighborhood."""
    d = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = d.groupBy("a").agg(F.min("b").alias("m"))
    joined = d.join(mins, "a")
    return (
        joined.filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("a"), F.col("m").alias("b")))
        .distinct()
    )


def _star_contraction(sym: DataFrame, max_passes: int) -> DataFrame:
    """Alternate large-star/small-star until the edge set is a fixed
    point (a forest of stars (v, root)); returns (node, comp) labels.
    Each pass is a single dependency chain over one checkpointed edge
    relation — constant plan size per pass."""
    e = sym.localCheckpoint()
    # the star passes drop self-loops (a != b), so a node whose only
    # edges are self-loops would vanish from the label output while the
    # min-label fast path keeps it — preserve the full node set and
    # left-join the star labels back over it at the end
    all_nodes = sym.select(F.col("a").alias("node")).distinct().localCheckpoint()
    prev_fp = None
    for _ in range(max_passes):
        ls = _large_star(
            e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
        )
        e = _small_star(ls).localCheckpoint()
        # order-insensitive, overflow-free edge-set fingerprint
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        fp = (int(row["n"]), int(row["h"]) if row["h"] is not None else 0)
        if fp == prev_fp:
            # stars: every edge is (node, component-root); nodes with
            # no surviving edge (self-loop-only) label themselves
            labels = (
                e.select(F.col("a").alias("node"), F.col("b").alias("comp"))
                .union(
                    e.select(F.col("b").alias("node"), F.col("b").alias("comp"))
                )
                .distinct()
            )
            return (
                all_nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("comp", F.col("node")).alias("comp"),
                )
            )
        prev_fp = fp
    raise RuntimeError(
        f"connected_components did not converge: star contraction made "
        f"{max_passes} passes without reaching a fixed point — needs "
        "O(log^2 n); raise max_iterations for astronomically deep graphs"
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    propagation_rounds: int = 8,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id in the connected component. Dedup-shaped
    graphs converge on the min-label fast path in 2-4 rounds; a graph
    still unconverged after ``propagation_rounds`` switches to
    large-star/small-star contraction (O(log^2 n) passes on any
    graph, bounded by ``max_iterations``)."""
    # localCheckpoint (not persist): each round must TRUNCATE the
    # logical plan, not just cache data — with persist the plan still
    # doubles per round (the cached subtree is re-analyzed inside the
    # next join), and a high-diameter graph OOMs the driver on plan
    # bookkeeping long before any data is large. Trade-off: local
    # checkpoints are not fault-tolerant across executor loss; for a
    # long multi-round production run, set a reliable checkpoint dir
    # and swap in DataFrame.checkpoint.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(min(propagation_rounds, max_iterations)):
        neigh_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("neigh_comp", F.col("comp"))
                ).alias("comp"),
                (F.col("neigh_comp") < F.col("comp")).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    # high-diameter fallback: star contraction on the original edges
    return _star_contraction(sym, max_passes=max_iterations)


def cluster_assignments(
    docs: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: docs in a duplicate
    component get the component's min id, singletons map to
    themselves."""
    comp = connected_components(edges).withColumnRenamed("node", id_col)
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
    )


def keep_best_per_cluster(
    assignments: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Representative selection: per duplicate cluster keep the
    highest-quality doc (min id tiebreak). One hash-shuffle by
    cluster; max_by does the map-side partial combine (same skew-proof
    shape as the CDC compaction)."""
    j = assignments.join(quality, id_col)
    # order key: quality desc, then doc_id asc -> max_by on
    # (quality, -doc_id) struct
    pick = F.max_by(
        F.col(id_col), F.struct(F.col(quality_col), -F.col(id_col))
    ).alias("keeper_doc_id")
    return (
        j.groupBy("cluster_id")
        .agg(pick, F.count(F.lit(1)).alias("n_docs"))
        .select("cluster_id", "keeper_doc_id", "n_docs")
    )
