"""Operator-level behavior of the text-analysis/dedup suite beyond
the oracle queries: banding variants, thresholds, dedup keepers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.operators import text_analysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog", "en"),  # near dup
        (4, "completely different words entirely here now", "en"),
        (5, "der hund ist und das war die katze und so", "de"),
        (6, "a b", "en"),  # too short for 3-shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return df.cache()


def test_exact_dedup_groups(spark, docs):
    out = {r["keeper"]: r["n_docs"] for r in ta.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 identical, keeper = min id
    assert out[3] == 1


def test_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ta.lsh_candidate_pairs(docs, rows_per_band=1).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup shares minima
    assert not any(4 in p for p in pairs)  # unrelated doc stays out


def test_lsh_r2_is_subset_of_r1(spark, docs):
    r1 = {
        (r["id_a"], r["id_b"])
        for r in ta.lsh_candidate_pairs(docs, rows_per_band=1).collect()
    }
    r2 = {
        (r["id_a"], r["id_b"])
        for r in ta.lsh_candidate_pairs(docs, rows_per_band=2).collect()
    }
    assert r2 <= r1  # r=2 banding strictly more selective


def test_jaccard_threshold(spark, docs):
    strict = ta.jaccard_pairs(docs, threshold_num=9, threshold_den=10).collect()
    loose = ta.jaccard_pairs(docs, threshold_num=1, threshold_den=10).collect()
    strict_pairs = {(r["id_a"], r["id_b"]) for r in strict}
    loose_pairs = {(r["id_a"], r["id_b"]) for r in loose}
    assert (1, 2) in strict_pairs  # identical: jaccard 1.0
    assert strict_pairs <= loose_pairs
    assert (1, 3) in loose_pairs  # near dup passes the loose gate


def test_jaccard_all_pairs_guard(spark, docs):
    """VERDICT round-2 #5: the all-pairs ground-truth mode refuses a
    corpus above max_docs unless ground_truth=True is explicit."""
    with pytest.raises(ValueError, match="ground-truth mode"):
        ta.jaccard_pairs(docs, max_docs=3)
    # explicit opt-in runs the exhaustive mode regardless of size
    assert ta.jaccard_pairs(docs, max_docs=3, ground_truth=True).count() > 0
    # under the threshold: no opt-in needed (the oracle-gate path)
    assert ta.jaccard_pairs(docs, max_docs=100).count() > 0


def test_simhash_similarity(spark, docs):
    sh = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", ta.simhash16().alias("sh")).collect()}
    assert sh[1] == sh[2]  # identical docs: identical simhash
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near <= ham_far  # near dup at most as far as unrelated


def test_lang_guess(spark, docs):
    out = {r["doc_id"]: r["g"] for r in docs.select(
        "doc_id", ta.lang_guess().alias("g")).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_quality_and_tokens(spark, docs):
    row = (
        docs.filter(F.col("doc_id") == 1)
        .select(
            ta.token_count().alias("n"),
            ta.stopword_count().alias("sw"),
        )
        .collect()[0]
    )
    assert row["n"] == 9
    assert row["sw"] == 2  # 'the' twice

def test_ivf_kmeans_variant_recall(spark):
    """The KMeans-trained IVF quantizer (production variant of the
    deterministic-quantizer contract query): nprobe=1 cell search must
    return per-query ranked neighbors with reasonable recall vs the
    brute-force top-k."""
    from debezium_connector_ibmi_spark.queries.embeddingops import (
        emb_ivf_topk_kmeans,
        emb_knn_brute_force,
    )

    sf = "/root/testdata/sf0.001"
    ivf = [
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in emb_ivf_topk_kmeans(spark, sf).collect()
    ]
    assert ivf, "IVF returned nothing"
    by_q = {}
    for q, n, rk in ivf:
        by_q.setdefault(q, []).append(rk)
    assert set(by_q) == set(range(10))  # all 10 queries answered
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in emb_knn_brute_force(spark, sf).collect()
    }
    hits = sum(1 for q, n, _ in ivf if (q, n) in bf)
    assert hits / len(ivf) >= 0.3, f"recall vs brute force: {hits}/{len(ivf)}"


def test_chunk_tokens_boundaries(spark):
    """Chunk windows: stride positions, overlap content, short tail,
    single-chunk short docs, full reconstruction of the token stream."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens, 1 chunk
        (2, " ".join(f"t{i}" for i in range(8))),    # == chunk_size
        (3, " ".join(f"t{i}" for i in range(9))),    # chunk_size + 1
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in ta.chunk_tokens(df, chunk_size=8, overlap=2).collect()
    }
    # doc 1 (10 tokens, stride 6): chunks [0..7], [6..9]
    assert out[(1, 0)][0].split() == [f"t{i}" for i in range(8)]
    assert out[(1, 1)][0].split() == [f"t{i}" for i in range(6, 10)]
    assert out[(1, 1)][1] == 4
    # doc 2: exactly one full chunk
    assert out[(2, 0)][1] == 8 and (2, 1) not in out
    # doc 3 (9 tokens): second chunk = overlap tail [6..8]
    assert out[(3, 1)][0].split() == ["t6", "t7", "t8"]
    # doc 4: short doc still yields one chunk
    assert out[(4, 0)] == ("solo", 1)
    # overlap region of consecutive chunks repeats exactly
    assert out[(1, 0)][0].split()[-2:] == out[(1, 1)][0].split()[:2]


def test_bpe_token_pattern_parity_with_re2(spark):
    """Round-4: the GPT-2-ish pre-tokenizer pattern must tokenize
    identically under Java regex (Spark) and RE2 (DuckDB) — pinned on
    adversarial strings (contractions, unicode letters, digit runs,
    punctuation runs, multi-space, empty)."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_ibmi_spark.operators.text_analysis import (
        BPE_TOKEN_PATTERN,
        bpe_token_count,
    )

    texts = [
        "Hello, world! It's 2024 — really?",
        "foo  bar   baz\ttab",
        "a1b2 c3, d'4 naïve café 北京 123abc",
        "",
        "   ",
        "don't stop-me now!!!",
        "x'll y've z're w'd q'm",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_token_count().alias("n")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT length(regexp_extract_all(?, ?))",
            [t, BPE_TOKEN_PATTERN],
        ).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)


def test_winnowing_guarantee_and_bounds(spark):
    """Winnowing property (Schleimer et al.): documents sharing a run
    of >= w+k-1 tokens share at least one fingerprint; fingerprint
    count per doc is bounded by the number of hash windows; and the
    selection is deterministic."""
    from pyspark.sql import functions as F

    from debezium_connector_ibmi_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 tokens
    docs = [
        (1, f"intro words here {shared} tail one"),
        (2, f"{shared} completely different ending text"),
        (3, "no overlap with anything else at all"),
        (4, "tiny doc"),  # < k tokens -> no fingerprints
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = df.select(
        "doc_id", winnow_fingerprints("text", k=k, w=w).alias("fps")
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in out.collect()}
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert fps[4] == set()
    for did, text in docs[:3]:
        n_tokens = len(text.split(" "))
        n_windows = max(n_tokens - k + 1 - w + 1, 1)
        assert 1 <= len(fps[did]) <= n_windows
    out2 = {r["doc_id"]: set(r["fps"]) for r in out.collect()}
    assert out2 == fps  # deterministic
