"""Driver-gate queries for the multimodal operators
(operators/multimodal.py) over REAL byte formats: each document's
doc_id deterministically generates a spec-valid PNG / WAV / animated-
GIF payload (datagen/media.py, stdlib-only), the operators genuinely
parse those bytes (IHDR decode, RIFF chunk walk, int16 sample decode,
GIF block walk over image descriptors), and the DuckDB oracle
independently predicts what the parse must find from the same doc_id
arithmetic — so a broken parser (wrong offset, wrong endianness,
wrong chunk/block walk) hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.datagen.media import media_from_docs
from debezium_connector_ibmi_spark.operators.multimodal import (
    audio_features,
    image_metadata,
    resize_images,
    sample_frames,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def mm_image_meta(spark, sf_dir):
    """Real PNG IHDR parse of generated spec-valid PNGs."""
    return image_metadata(media_from_docs(_docs(spark, sf_dir), "image"))


def mm_audio_features(spark, sf_dir):
    """Real RIFF/WAVE fmt+data chunk parse + int16 sample decode."""
    return audio_features(media_from_docs(_docs(spark, sf_dir), "audio"))


def mm_image_resize(spark, sf_dir):
    """Bounded aspect-preserving resize from REAL parsed input dims
    (max_dim=64 exercises both the passthrough and downscale arms)."""
    return resize_images(
        media_from_docs(_docs(spark, sf_dir), "image"), max_dim=64
    )


def mm_frame_sample(spark, sf_dir):
    """1-to-N frame sampling (every_n=1: one row per frame) over REAL
    multi-frame animated GIFs — the block walk counts image
    descriptors and reads geometry + graphic-control delay."""
    return sample_frames(
        media_from_docs(_docs(spark, sf_dir), "video"), every_n=1
    )


QUERIES = {
    "mm_image_meta": mm_image_meta,
    "mm_audio_features": mm_audio_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_image_resize": mm_image_resize,
}

# Oracle arithmetic mirrors datagen/media.py's closed forms:
#   width  = doc_id % 120 + 8          (PNG, [8, 127])
#   height = (doc_id*7) % 90 + 8       (PNG, [8, 97])
#   n_bytes = 68 + h*(1 + 3w)          (stored-IDAT PNG size)
#   rate   = 8000 * (1 + doc_id % 5)   (WAV)
#   n      = doc_id % 500 + 50         (WAV samples)
#   sample_i = (doc_id*31 + i*17) % 2003 - 1001
ORACLES = {
    "mm_image_meta": """
        SELECT doc_id AS media_id,
               CAST(doc_id % 120 + 8 AS INT) AS width,
               CAST((doc_id * 7) % 90 + 8 AS INT) AS height,
               CAST(8 AS INT) AS bit_depth,
               CAST(2 AS INT) AS color_type,
               CAST(68 + ((doc_id * 7) % 90 + 8)
                    * (1 + 3 * (doc_id % 120 + 8)) AS INT) AS n_bytes
        FROM documents
    """,
    "mm_audio_features": """
        WITH d AS (
            SELECT doc_id,
                   CAST(8000 * (1 + doc_id % 5) AS INT) AS sample_rate,
                   doc_id % 500 + 50 AS n
            FROM documents
        ), s AS (
            SELECT doc_id, sample_rate, n,
                   unnest(range(0, n)) AS i
            FROM d
        )
        SELECT doc_id AS media_id,
               sample_rate,
               CAST(1 AS INT) AS n_channels,
               CAST(16 AS INT) AS bits_per_sample,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // sample_rate AS BIGINT) AS duration_ms,
               CAST(sum(abs((doc_id * 31 + i * 17) % 2003 - 1001))
                    AS BIGINT) AS sum_abs_amplitude
        FROM s
        GROUP BY doc_id, sample_rate, n
    """,
    "mm_frame_sample": """
        WITH d AS (
            SELECT doc_id,
                   CAST(doc_id % 24 + 4 AS INT) AS w,
                   CAST((doc_id * 5) % 18 + 4 AS INT) AS h,
                   doc_id % 12 + 2 AS n,
                   CAST(doc_id % 20 + 2 AS INT) AS delay
            FROM documents
        )
        SELECT doc_id AS media_id,
               CAST(unnest(range(0, n)) AS INT) AS frame_idx,
               w AS frame_w, h AS frame_h, delay AS delay_cs,
               CAST(NULL AS VARCHAR) AS frame_phash
        FROM d
    """,
    "mm_image_resize": """
        WITH d AS (
            SELECT doc_id,
                   CAST(doc_id % 120 + 8 AS INT) AS w,
                   CAST((doc_id * 7) % 90 + 8 AS INT) AS h
            FROM documents
        ), r AS (
            SELECT doc_id, w, h,
                   CASE WHEN greatest(w, h) <= 64 THEN w
                        ELSE greatest(1, w * 64 // greatest(w, h)) END AS ow,
                   CASE WHEN greatest(w, h) <= 64 THEN h
                        ELSE greatest(1, h * 64 // greatest(w, h)) END AS oh
            FROM d
        )
        SELECT doc_id AS media_id,
               w AS width, h AS height,
               CAST(ow AS INT) AS out_width,
               CAST(oh AS INT) AS out_height,
               CAST(68 + oh * (1 + 3 * ow) AS BIGINT) AS out_n_bytes
        FROM r
    """,
}
