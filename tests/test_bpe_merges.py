"""Round-5 (VERDICT r4 #5): BPE token counting with the pinned merge
table. Parity is pinned against an INDEPENDENT reference
implementation (sequential application in rank order — equivalent to
the lowest-rank-first loop for any table produced by BPE training,
because a pair involving a symbol created at rank r always ranks
after r), on adversarial strings the corpus never showed the
trainer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.functions.bpe import (
    bpe_apply,
    frozen_ranks,
    merged_token_count,
    pretokenize,
    train_bpe,
)
from debezium_connector_ibmi_spark.functions.bpe_vocab import FROZEN_MERGES
from debezium_connector_ibmi_spark.operators.text_analysis import (
    bpe_token_count,
    merged_bpe_token_count_udf,
)

ADVERSARIAL = [
    "",
    " ",
    "   \t\n  ",
    "the quick brown fox jumps over the lazy dog",
    "it's don't we're I'll they've I'm he'd",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "ababababababababab",
    "word",
    "x",
    "12345 67890 3.14159",
    "!!!???...,,,;;;:::",
    "héllo wörld çafé naïve",
    "日本語のテキスト and English mixed",
    "emoji 🎉🎊 in text",
    "CamelCaseWords and_snake_case and-kebab-case",
    "  leading and trailing  ",
    "tab\tseparated\nnewline separated",
]


def _reference_count(text: str) -> int:
    """Independent algorithm: apply each merge over the whole symbol
    sequence strictly in rank order (0, 1, 2, ...)."""
    n = 0
    for pt in pretokenize(text):
        syms = [bytes([b]) for b in pt.encode("utf-8")]
        for a, b in FROZEN_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n += len(syms)
    return n


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_merged_count_matches_rank_order_reference(text):
    assert merged_token_count(text, frozen_ranks()) == _reference_count(
        text
    )


def test_merged_count_bounds():
    """merged >= pretoken count (each pretoken yields >= 1 token) and
    <= UTF-8 byte count (merges only ever shrink)."""
    ranks = frozen_ranks()
    for text in ADVERSARIAL:
        if not text:
            continue
        pre = len(pretokenize(text))
        merged = merged_token_count(text, ranks)
        nbytes = sum(len(pt.encode("utf-8")) for pt in pretokenize(text))
        assert pre <= merged <= nbytes, text


def test_merges_actually_merge_corpus_text():
    """On corpus-like text the table must do real work: merged count
    strictly below the byte count and above the pretoken count."""
    ranks = frozen_ranks()
    t = "the spark engine reads the journal and merges the state"
    nbytes = sum(len(pt.encode("utf-8")) for pt in pretokenize(t))
    merged = merged_token_count(t, ranks)
    assert merged < nbytes * 0.6, "table saturates: merges must bite"


def test_bpe_apply_memo_cache_consistent():
    ranks = frozen_ranks()
    cache: dict[str, int] = {}
    t = "the the the journal journal merges"
    a = merged_token_count(t, ranks, cache)
    b = merged_token_count(t, ranks, cache)  # fully cached second pass
    assert a == b == _reference_count(t)
    assert cache  # cache actually used


def test_trainer_is_deterministic_and_ordered():
    texts = ["abab abab cdcd", "abab cdcd cdcd", "abab xyxy"]
    m1 = train_bpe(texts, 10)
    m2 = train_bpe(list(texts), 10)
    assert m1 == m2
    # a merge that uses a created symbol must come after its creation
    created = set()
    for a, b in m1:
        for part in (a, b):
            if len(part) > 1:
                assert part in created, (part, m1)
        created.add(a + b)


def test_spark_udf_matches_pure_python(spark):
    """The Arrow-batched column == the pure-Python count, and the
    pre-merge proxy column is a lower bound, over real corpus docs."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50)
    )
    rows = docs.select(
        "doc_id",
        "text",
        bpe_token_count().alias("pre"),
        merged_bpe_token_count_udf()(F.col("text")).alias("merged"),
    ).collect()
    assert rows
    ranks = frozen_ranks()
    cache: dict[str, int] = {}
    for r in rows:
        assert r["merged"] == merged_token_count(r["text"], ranks, cache), (
            r["doc_id"]
        )
        assert r["merged"] >= r["pre"]
