"""Corpus-pipeline operators (operators/corpus_ops.py): PII scrub
regex semantics on crafted strings (the driver-gate corpus has no
real PII, so the functional behavior is proven here), deterministic
hash sampling, benchmark decontamination, chunk-level dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.operators.corpus_ops import (
    chunk_dedup_stats,
    contamination,
    hash_bucket,
    hash_sample,
    pii_scrub,
)


def _scrub_one(spark, s: str) -> str:
    return (
        spark.createDataFrame([(s,)], "text string")
        .select(pii_scrub("text").alias("o"))
        .first()["o"]
    )


def test_pii_scrub_email_phone_ip(spark):
    assert (
        _scrub_one(spark, "mail a.b+c%d@sub.example.co.uk now")
        == "mail <EMAIL> now"
    )
    assert _scrub_one(spark, "call 555-123-4567 or 555 987 6543 x") == (
        "call <PHONE> or <PHONE> x"
    )
    assert _scrub_one(spark, "host 192.168.0.1 and 10.0.255.7.") == (
        "host <IP> and <IP>."
    )
    # email wins over the phone/IP patterns inside its own match
    assert _scrub_one(spark, "x 555.123.4567@digits.example.com y") == (
        "x <EMAIL> y"
    )


def test_pii_scrub_leaves_clean_text_alone(spark):
    s = "no pii here just words and numbers like 42 or 3.14"
    assert _scrub_one(spark, s) == s


def test_hash_sample_deterministic_and_partition_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in hash_sample(df, "k", 10).collect())
    b = sorted(
        r["k"]
        for r in hash_sample(df.repartition(13), "k", 10).collect()
    )
    assert a == b, "sample must not depend on partitioning"
    # ~10% with slack; exact count is pinned by determinism above
    assert 120 <= len(a) <= 280
    # different salt -> different (still deterministic) sample
    c = sorted(r["k"] for r in hash_sample(df, "k", 10, salt="other").collect())
    assert a != c
    # buckets cover [0, 100)
    rng = df.select(hash_bucket(F.col("k")).alias("b")).agg(
        F.min("b"), F.max("b")
    ).first()
    assert rng[0] >= 0 and rng[1] < 100


def test_contamination_flags_overlap_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "one two three four five six"),          # disjoint
            (3, "tiny doc"),                             # shorter than n -> clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination(docs, bench, n=5).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_contamination_broadcast_guard(spark):
    """Round-4 (VERDICT r3 #8): the benchmark-shingle broadcast is
    size-guarded. auto with a tiny threshold falls back to a shuffle
    join (no broadcast exchange in the plan); forced modes pin their
    join strategy; both modes agree on results."""
    import pytest

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon token{i}") for i in range(6)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )

    def plan(join_mode, **kw):
        df = contamination(docs, bench, n=5, join_mode=join_mode, **kw)
        return df, df._jdf.queryExecution().executedPlan().toString()

    bc_df, bc_plan = plan("broadcast")
    sh_df, sh_plan = plan("shuffle")
    assert "BroadcastHashJoin" in bc_plan
    assert "BroadcastHashJoin" not in sh_plan  # guard actually disables it
    # auto picks shuffle when the distinct-shingle count exceeds the
    # threshold, broadcast otherwise
    _, auto_small = plan("auto", broadcast_threshold=0)
    assert "BroadcastHashJoin" not in auto_small
    _, auto_big = plan("auto", broadcast_threshold=10_000)
    assert "BroadcastHashJoin" in auto_big
    # strategies agree on the answer
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(bc_df) == key(sh_df)
    with pytest.raises(ValueError, match="join_mode"):
        contamination(docs, bench, join_mode="nope")


def test_chunk_dedup_first_occurrence_wins(spark):
    # doc 1: two identical 3-token chunks; doc 2 repeats doc 1's first
    # chunk. Keeper = lowest (doc_id, chunk_idx).
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
        for r in chunk_dedup_stats(docs, chunk_size=3).collect()
    }
    assert out[1] == (2, 1)  # second copy within doc 1 is a dup
    assert out[2] == (2, 1)  # doc 2's "a b c" lost to doc 1's chunk 0


def test_normalize_url_pinned_cases(spark):
    """Hand-pinned canonical forms — not just cross-engine agreement:
    default-port strip per scheme, non-default port kept, fragment
    drop, query sort, empty-query drop, empty path -> '/'."""
    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        normalize_url,
    )

    cases = [
        ("HTTPS://WWW.Ex.COM:443/A/b?b=2&a=1#frag",
         "https://www.ex.com/A/b?a=1&b=2"),
        ("http://EX.com:80/", "http://ex.com/"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),
        ("https://ex.com:8443/x?z=1", "https://ex.com:8443/x?z=1"),
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com?", "https://ex.com/"),
        ("https://ex.com/p#only-frag", "https://ex.com/p"),
        ("https://ex.com:443", "https://ex.com/"),
        # path case is semantic and preserved; host case is not
        ("https://Ex.Com/CaseSensitive/Path",
         "https://ex.com/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    out = df.select("url", "expected", normalize_url("url").alias("got"))
    for r in out.collect():
        assert r["got"] == r["expected"], (r["url"], r["got"])
    # idempotent: normalizing a normal form is a no-op
    out2 = df.select(
        normalize_url(normalize_url("url")).alias("twice"),
        normalize_url("url").alias("once"),
    )
    for r in out2.collect():
        assert r["twice"] == r["once"]


# -- Gopher composite quality gate -----------------------------------
def _gopher_docs(spark):
    good = " ".join(
        (["the", "be", "to", "of"] + [f"word{i}" for i in range(56)])
    )  # 60 words, stopwords present, all alpha
    short = "the be only five words"
    symbols = " ".join(["the", "be"] + ["###"] * 30 + ["w"] * 28)
    nonalpha = " ".join(["the", "be"] + ["123"] * 58)
    no_stop = " ".join(f"w{i}" for i in range(60))
    dup_lines = "\n".join(["the be same line of words"] * 10)
    return spark.createDataFrame(
        [
            (0, good), (1, short), (2, symbols),
            (3, nonalpha), (4, no_stop), (5, dup_lines),
        ],
        "doc_id long, text string",
    )


def test_gopher_flags_per_rule(spark):
    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        gopher_quality_flags,
    )

    out = {r.doc_id: r for r in gopher_quality_flags(_gopher_docs(spark)).collect()}
    assert out[0].gopher_pass and out[0].gopher_reasons == []
    assert not out[1].gopher_pass and "word_count" in out[1].gopher_reasons
    assert not out[2].gopher_pass and "symbol_ratio" in out[2].gopher_reasons
    assert not out[3].gopher_pass and "alpha_ratio" in out[3].gopher_reasons
    assert not out[4].gopher_pass and "stopword_hits" in out[4].gopher_reasons
    assert "dup_line_ratio" in out[5].gopher_reasons


def test_gopher_filter_keeps_original_schema(spark):
    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        gopher_filter,
    )

    docs = _gopher_docs(spark)
    out = gopher_filter(docs)
    assert out.columns == docs.columns
    assert [r.doc_id for r in out.collect()] == [0]


def test_gopher_params_override(spark):
    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        gopher_quality_flags,
    )

    out = {
        r.doc_id: r.gopher_pass
        for r in gopher_quality_flags(
            _gopher_docs(spark), params={"min_words": 5}
        ).collect()
    }
    assert out[1] is True  # the 5-word doc passes with the low bound


def test_gopher_is_map_only(spark):
    from debezium_connector_ibmi_spark.operators.corpus_ops import (
        gopher_quality_flags,
    )

    df = gopher_quality_flags(_gopher_docs(spark))
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in s, "quality gate must not shuffle"
