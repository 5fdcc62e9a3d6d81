"""Training-data text operators over the ``documents`` table —
dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard), language-ID,
quality scoring, token counting, fingerprinting.

These are first-class engine ops for the 100 TB webtext use case.
Everything below is pure built-in Catalyst expressions (split /
transform / aggregate / md5 higher-order funcs) — no Python UDFs —
so the hot path stays in whole-stage codegen, and each has an exact
DuckDB oracle (md5 and string ops are portable; jaccard thresholds
use integer arithmetic to avoid float divergence).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _words():
    return F.split(F.col("text"), " ")

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


# --- token counting -----------------------------------------------------
def doc_token_count(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_words()).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# --- quality scoring ------------------------------------------------------
def doc_quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("words", _words())
    n_tok = F.size("words")
    sw = F.size(
        F.filter(F.col("words"), lambda w: w.isin(*_STOPWORDS))
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        sw.alias("n_stopwords"),
        # integer-scaled ratios: exact across engines
        (sw * 1000).cast("long").alias("sw_scaled"),
        ((F.length("text") - (n_tok - 1)) * 100).cast("long").alias(
            "charlen_scaled"
        ),
    )


# --- language-ID (n-gram / stopword heuristic) ------------------------------
def doc_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("words", _words())
    en_hits = F.size(F.filter(F.col("words"), lambda w: w.isin(*_STOPWORDS)))
    de_hits = F.size(
        F.filter(F.col("words"), lambda w: w.isin("der", "die", "das", "und", "ist"))
    )
    return d.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        de_hits.alias("de_hits"),
        F.when(en_hits > de_hits, "en")
        .when(de_hits > en_hits, "de")
        .otherwise("unknown")
        .alias("lang_guess"),
    )


# --- fingerprinting -----------------------------------------------------------
def doc_fingerprint(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.length("text").alias("fp_len"),
    )


# --- exact dedup (hash-groupBy) -------------------------------------------------
def doc_dedup_exact(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# --- MinHash signatures (shingle -> min(md5(seed||shingle))) ---------------------
_N_SHINGLE = 3
_SEEDS = ("s0", "s1", "s2", "s3")


def _shingles_col():
    """3-word shingles as an array<string> (space-joined)."""
    w = _words()
    return F.transform(
        F.sequence(F.lit(0), F.size(w) - _N_SHINGLE),
        lambda i: F.array_join(F.slice(w, i + 1, _N_SHINGLE), " "),
    )


def doc_minhash_signature(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.size(_words()) >= _N_SHINGLE)
    d = d.withColumn("sh", _shingles_col())
    cols = [
        F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(seed), s)))
        ).alias(f"minhash_{i}")
        for i, seed in enumerate(_SEEDS)
    ]
    return d.select("doc_id", *cols)


_MINHASH_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ), pos AS (
        SELECT doc_id, unnest(words) AS word,
               generate_subscripts(words, 1) AS p
        FROM w
    ), sh AS (
        SELECT doc_id,
               word || ' ' || lead(word, 1) OVER win || ' ' ||
               lead(word, 2) OVER win AS shingle,
               p, (SELECT 1) AS dummy,
               count(*) OVER (PARTITION BY doc_id) AS n_words
        FROM pos
        WINDOW win AS (PARTITION BY doc_id ORDER BY p)
        QUALIFY p <= n_words - 2
    )
    SELECT doc_id,
           min(md5('s0' || shingle)) AS minhash_0,
           min(md5('s1' || shingle)) AS minhash_1,
           min(md5('s2' || shingle)) AS minhash_2,
           min(md5('s3' || shingle)) AS minhash_3
    FROM sh GROUP BY doc_id
"""


# --- MinHash LSH near-dup candidate pairs (band join) -----------------------------
def doc_lsh_near_dup_pairs(spark, sf_dir):
    """Banded LSH: melt the signature to (doc_id, band_idx, band) and
    self-join ONCE on (band_idx, band) — the signature (the expensive
    shingle/minhash pass) is computed a single time, vs. 2x per band
    with per-band joins. Bucket join shuffles only the 4-row-per-doc
    melted table, never the documents."""
    sig = doc_minhash_signature(spark, sf_dir)
    melted = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"minhash_{i}").alias("band"),
                    )
                    for i in range(len(_SEEDS))
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band")
    a = melted.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band"
    )
    b = melted.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band"
    )
    return (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# --- SimHash (16-bit, md5-hex-char bits, per-bit majority) --------------------------
def doc_simhash(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("words", _words())
    n = F.size("words")
    bits = []
    for i in range(1, 17):
        cnt = F.size(
            F.filter(
                F.col("words"), lambda w: F.substring(F.md5(w), i, 1) >= "8"
            )
        )
        bits.append(F.when(cnt * 2 > n, F.lit(1 << (i - 1))).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return d.select("doc_id", total.cast("long").alias("simhash"))


_SIMHASH_SQL = (
    "SELECT doc_id, CAST("
    + " + ".join(
        f"(CASE WHEN 2 * len(list_filter(string_split(text,' '),"
        f" w -> substring(md5(w), {i}, 1) >= '8'))"
        f" > len(string_split(text,' ')) THEN {1 << (i - 1)} ELSE 0 END)"
        for i in range(1, 17)
    )
    + " AS BIGINT) AS simhash FROM documents"
)


# --- n-gram Jaccard near-dup pairs (shingle join, integer threshold) -----------------
def doc_ngram_jaccard_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.size(_words()) >= _N_SHINGLE)
    sh = (
        d.select("doc_id", F.explode(_shingles_col()).alias("shingle"))
        .distinct()
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = inter.join(ca, "doc_a").join(cb, "doc_b")
    # jaccard >= 0.3 via integer arithmetic: 10*inter >= 3*(na+nb-inter)
    return j.filter(
        10 * F.col("inter") >= 3 * (F.col("na") + F.col("nb") - F.col("inter"))
    ).select("doc_a", "doc_b", "inter", "na", "nb")


_JACCARD_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ), pos AS (
        SELECT doc_id, unnest(words) AS word,
               generate_subscripts(words, 1) AS p
        FROM w
    ), sh0 AS (
        SELECT doc_id,
               word || ' ' || lead(word, 1) OVER win || ' ' ||
               lead(word, 2) OVER win AS shingle,
               p, count(*) OVER (PARTITION BY doc_id) AS n_words
        FROM pos
        WINDOW win AS (PARTITION BY doc_id ORDER BY p)
        QUALIFY p <= n_words - 2
    ), sh AS (
        SELECT DISTINCT doc_id, shingle FROM sh0
    ), counts AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter, ca.n_sh AS na, cb.n_sh AS nb
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE 10 * inter >= 3 * (ca.n_sh + cb.n_sh - inter)
"""


QUERIES = {
    "doc_token_count": doc_token_count,
    "doc_quality_score": doc_quality_score,
    "doc_lang_id": doc_lang_id,
    "doc_fingerprint": doc_fingerprint,
    "doc_dedup_exact": doc_dedup_exact,
    "doc_minhash_signature": doc_minhash_signature,
    "doc_lsh_near_dup_pairs": doc_lsh_near_dup_pairs,
    "doc_simhash": doc_simhash,
    "doc_ngram_jaccard_pairs": doc_ngram_jaccard_pairs,
}

ORACLES = {
    "doc_token_count": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(text) AS n_chars_actual
        FROM documents
    """,
    "doc_quality_score": f"""
        SELECT doc_id,
               len(text) AS n_chars_actual,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   w -> w IN ({_SW_LIST}))) AS n_stopwords,
               CAST(len(list_filter(string_split(text, ' '),
                   w -> w IN ({_SW_LIST}))) * 1000 AS BIGINT) AS sw_scaled,
               CAST((len(text) - (len(string_split(text, ' ')) - 1)) * 100
                   AS BIGINT) AS charlen_scaled
        FROM documents
    """,
    "doc_lang_id": f"""
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                   w -> w IN ({_SW_LIST}))) AS en_hits,
               len(list_filter(string_split(text, ' '),
                   w -> w IN ('der','die','das','und','ist'))) AS de_hits,
               CASE
                 WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ({_SW_LIST})))
                    > len(list_filter(string_split(text, ' '),
                      w -> w IN ('der','die','das','und','ist'))) THEN 'en'
                 WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('der','die','das','und','ist')))
                    > len(list_filter(string_split(text, ' '),
                      w -> w IN ({_SW_LIST}))) THEN 'de'
                 ELSE 'unknown'
               END AS lang_guess
        FROM documents
    """,
    "doc_fingerprint": """
        SELECT doc_id, md5(text) AS fp, len(text) AS fp_len FROM documents
    """,
    "doc_dedup_exact": """
        SELECT md5(text) AS fp, count(*) AS n_docs,
               min(doc_id) AS keeper_doc_id
        FROM documents GROUP BY 1
    """,
    "doc_minhash_signature": _MINHASH_SQL,
    "doc_lsh_near_dup_pairs": f"""
        WITH sig AS ({_MINHASH_SQL})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         AND (a.minhash_0 = b.minhash_0 OR a.minhash_1 = b.minhash_1
           OR a.minhash_2 = b.minhash_2 OR a.minhash_3 = b.minhash_3)
    """,
    "doc_simhash": _SIMHASH_SQL,
    "doc_ngram_jaccard_pairs": _JACCARD_SQL,
}
