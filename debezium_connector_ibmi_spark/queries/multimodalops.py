"""Driver-gate queries for the multimodal plumbing
(operators/multimodal.py): the REAL Arrow-batched mapInPandas
operators run over a media table derived from ``documents`` (payload =
utf-8 bytes of text, a stand-in for image/audio bytes), and the
deterministic codec fakes are reproduced exactly by DuckDB md5
arithmetic — so the gate checks schemas, batch iteration, the 1-to-N
frame shape, and the digest math, everything except the real codec
(which is env-gated, see operators/multimodal.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.operators.multimodal import (
    audio_features,
    image_metadata,
    resize_images,
    sample_frames,
)


def _media(spark, sf_dir, kind):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(f"{kind}/fake").alias("mime"),
        F.lit(None).cast("string").alias("source_url"),
    )


def mm_image_meta(spark, sf_dir):
    return image_metadata(_media(spark, sf_dir, "image"))


def mm_audio_features(spark, sf_dir):
    return audio_features(_media(spark, sf_dir, "audio"))


def mm_image_resize(spark, sf_dir):
    """Bounded aspect-preserving resize (max_dim=512), integer
    arithmetic end-to-end."""
    return resize_images(_media(spark, sf_dir, "image"), max_dim=512)


def mm_frame_sample(spark, sf_dir):
    """1-to-N frame sampling (every_n=1: one row per fake frame)."""
    return sample_frames(_media(spark, sf_dir, "video"), every_n=1)


QUERIES = {
    "mm_image_meta": mm_image_meta,
    "mm_audio_features": mm_audio_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_image_resize": mm_image_resize,
}

# hex -> int: CAST('0x'||h AS INT); text payload is ASCII in the
# synthetic corpus but octet_length(BLOB) is used anyway for byte
# exactness
ORACLES = {
    "mm_image_meta": """
        SELECT doc_id AS media_id,
               CAST(CAST('0x' || substring(md5(text), 1, 4) AS INT)
                    % 1920 + 1 AS INT) AS width,
               CAST(CAST('0x' || substring(md5(text), 5, 4) AS INT)
                    % 1080 + 1 AS INT) AS height,
               CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
               substring(md5(text), 9, 8) AS phash
        FROM documents
    """,
    "mm_audio_features": """
        SELECT doc_id AS media_id,
               CAST(16000 AS INT) AS sample_rate,
               CAST(octet_length(CAST(text AS BLOB)) // 2 AS BIGINT)
                   AS n_samples,
               CAST(CAST('0x' || substring(md5(text), 1, 4) AS INT)
                    AS BIGINT) AS rms_x1000
        FROM documents
    """,
    "mm_frame_sample": """
        WITH x AS (
            SELECT doc_id, text,
                   unnest(range(0, greatest(1,
                       octet_length(CAST(text AS BLOB)) // 1000))) AS i
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(i AS INT) AS frame_idx,
               substring(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8)
                   AS frame_phash
        FROM x
    """,
}

ORACLES["mm_image_resize"] = """
    WITH d AS (
        SELECT doc_id, text,
               CAST(CAST('0x' || substring(md5(text), 1, 4) AS INT)
                    % 1920 + 1 AS INT) AS w,
               CAST(CAST('0x' || substring(md5(text), 5, 4) AS INT)
                    % 1080 + 1 AS INT) AS h
        FROM documents
    ), r AS (
        SELECT doc_id, text, w, h,
               CASE WHEN greatest(w, h) <= 512 THEN w
                    ELSE greatest(1, w * 512 // greatest(w, h)) END AS ow,
               CASE WHEN greatest(w, h) <= 512 THEN h
                    ELSE greatest(1, h * 512 // greatest(w, h)) END AS oh
        FROM d
    )
    SELECT doc_id AS media_id,
           w AS width, h AS height,
           CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
           CAST(ow * oh * 3 AS BIGINT) AS out_n_bytes,
           substring(md5(text || ':' || CAST(ow AS VARCHAR) || 'x'
               || CAST(oh AS VARCHAR)), 1, 8) AS resized_phash
    FROM r
"""
