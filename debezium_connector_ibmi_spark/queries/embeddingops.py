"""Similarity search over the ``embeddings`` table (vec_id,
embedding float[64], label): brute-force cosine top-k baseline and an
LSH/IVF-style bucketed variant (the scale path — candidates only from
the query's bucket).

Float caution: dot products are computed identically in Spark and the
DuckDB oracle (cast to double, sequential left-to-right fold), ranks
are decided on round(cos, 6) with vec_id tiebreak, and outputs are
integer-only (ids + rank) so the value-hash can't diverge on
float formatting.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_N_QUERIES = 10
_TOP_K = 5


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# --- brute-force cosine top-k (the correctness baseline) -----------------
def emb_knn_brute_force(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


# --- LSH-bucketed ANN: sign-code of leading dims = bucket ------------------
_N_SIGN_DIMS = 4


def _bucket(col):
    terms = [
        F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(_N_SIGN_DIMS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def emb_ann_lsh_bucket(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "bucket",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "bucket",
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


_DOT_SQL = (
    "list_aggregate(list_transform(list_zip(a.embedding, b.embedding),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)


def _cos_sql(av="a.embedding", bv="b.embedding"):
    dot = (
        f"list_aggregate(list_transform(list_zip({av}, {bv}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
    )
    na = (
        f"sqrt(list_aggregate(list_transform({av},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    nb = (
        f"sqrt(list_aggregate(list_transform({bv},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    return f"round({dot} / ({na} * {nb}), 6)"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_N_SIGN_DIMS)
)


QUERIES = {
    "emb_knn_brute_force": emb_knn_brute_force,
    "emb_ann_lsh_bucket": emb_ann_lsh_bucket,
}

ORACLES = {
    "emb_knn_brute_force": f"""
        SELECT query_id, neighbor_id, rank FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_cos_sql()} DESC, b.vec_id) AS rank
            FROM embeddings a, embeddings b
            WHERE a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id
        ) WHERE rank <= {_TOP_K}
    """,
    "emb_ann_lsh_bucket": f"""
        WITH e AS (
            SELECT vec_id, embedding, ({_BUCKET_SQL}) AS bucket
            FROM embeddings
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_cos_sql()} DESC, b.vec_id) AS rank
            FROM e a JOIN e b ON a.bucket = b.bucket
            WHERE a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id
        ) WHERE rank <= 3
    """,
}
