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
docs) so this converges in 2-4 rounds; for pathological HIGH-DIAMETER
graphs the loop adds Shiloach-Vishkin-style pointer jumping from
round 3 on (each node also adopts its current label's label,
``L(v) <- min(L(v), neigh mins, L(L(v)))`` — one extra self-join of
the label table), which halves-then-doubles label reach per round and
bounds convergence at O(log n) rounds instead of O(diameter): a
1000-node path converges in ~12 rounds where plain propagation needs
999. Convergence is checked with one count() action per round (a
scalar, not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id in the connected component. Raises if the
    graph needs more than ``max_iterations`` rounds (a dedup graph
    never should — that signals the input is not a dedup graph)."""
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
    for it in range(max_iterations):
        neigh_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        cand = labels.join(
            neigh_min, labels["node"] == neigh_min["a"], "left"
        ).select(
            "node",
            "comp",
            F.coalesce("neigh_comp", F.col("comp")).alias("neigh_comp"),
        )
        if it >= 2:
            # pointer jump (high-diameter fallback): also adopt the
            # current label's own label. A label is always a node id
            # in the same component, so this preserves correctness
            # while making label reach double per round — dedup-shaped
            # graphs have converged before round 3 and never pay the
            # extra self-join.
            jump = labels.select(
                F.col("node").alias("__c"), F.col("comp").alias("__cc")
            )
            cand = cand.join(
                jump, cand["comp"] == jump["__c"], "left"
            ).select(
                "node",
                "comp",
                F.least(
                    F.col("neigh_comp"),
                    F.coalesce("__cc", F.col("comp")),
                ).alias("neigh_comp"),
            )
        new_labels = cand.select(
            "node",
            F.least(F.col("comp"), F.col("neigh_comp")).alias("comp"),
            (F.col("neigh_comp") < F.col("comp")).alias("__changed"),
        ).localCheckpoint()
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds —"
        " with pointer jumping this needs ~log2(n) rounds; raise "
        "max_iterations only for graphs beyond ~2^20 nodes of diameter"
    )


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
