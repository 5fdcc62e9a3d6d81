"""Byte-level BPE token counting with a pinned merge table (round-5,
VERDICT r4 #5).

The map-only pre-tokenizer count (``operators/text_analysis.py
bpe_token_count``) is a proxy: it counts GPT-2-pretokenizer matches
but applies no merges, so the "LLM token budget" it reports can
diverge 30-50% from a real tokenizer's. This module adds the merge
step: a small deterministic merge table (``FROZEN_MERGES``, trained
once on the sf0.001 documents corpus by ``train_bpe`` and frozen as a
constant so every engine build tokenizes identically) applied per
pretoken by the classic GPT-2 ``bpe()`` ranking loop.

The trainer and the applier are plain Python on BYTES (byte-level BPE:
every pretoken starts as its UTF-8 byte sequence, so no unknown-token
handling is ever needed). The Spark surface is an Arrow-batched
``pandas_udf`` — the merge loop runs per DISTINCT pretoken thanks to a
memo cache, not per occurrence, so the hot cost is bounded by
pretoken-vocabulary size per batch, not corpus size.
"""

from __future__ import annotations

from collections import Counter

# the exact pattern Spark-side bpe_token_count uses (RE2-compatible
# GPT-2 pre-tokenizer); the `regex` module understands \p{..} classes
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def pretokenize(text: str) -> list[str]:
    import regex

    return regex.findall(PRETOKEN_PATTERN, text or "")


def train_bpe(
    texts: list[str], n_merges: int
) -> list[tuple[bytes, bytes]]:
    """Standard byte-level BPE training: count symbol-pair frequencies
    over the pretoken vocabulary (weighted by occurrence count), merge
    the most frequent pair, repeat. Deterministic: ties break on the
    lexicographically smallest pair. Incremental pair-count updates —
    only words containing the merged pair are re-counted — keep a
    500-merge train over a few-MB corpus in seconds."""
    vocab = Counter()
    for t in texts:
        vocab.update(pretokenize(t))
    # word id -> (symbol tuple, count)
    words = [
        [tuple(bytes([b]) for b in w.encode("utf-8")), c]
        for w, c in vocab.items()
    ]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms, c = words[wi]
            # remove old pair contributions of this word
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            # apply the merge within the word
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
            words[wi][0] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] += c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_apply(
    word: bytes, ranks: dict[tuple[bytes, bytes], int]
) -> list[bytes]:
    """Classic GPT-2 ``bpe()``: repeatedly merge the LOWEST-ranked
    adjacent pair present in the symbol sequence until none applies."""
    syms = [bytes([b]) for b in word]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair in this pass (standard
        # bpe(): occurrences are independent at equal rank)
        pair = (syms[best_i], syms[best_i + 1])
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and (syms[i], syms[i + 1]) == pair
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def merged_token_count(
    text: str,
    ranks: dict[tuple[bytes, bytes], int],
    cache: dict[str, int] | None = None,
) -> int:
    """Number of BPE tokens of ``text`` under ``ranks`` — the sum over
    pretokens of their post-merge symbol counts. ``cache`` memoizes
    per-pretoken counts (pretokens repeat heavily across a corpus)."""
    n = 0
    for pt in pretokenize(text):
        if cache is not None and pt in cache:
            n += cache[pt]
            continue
        c = len(bpe_apply(pt.encode("utf-8"), ranks))
        if cache is not None:
            cache[pt] = c
        n += c
    return n


def frozen_ranks() -> dict[tuple[bytes, bytes], int]:
    from debezium_connector_ibmi_spark.functions.bpe_vocab import (
        FROZEN_MERGES,
    )

    return {p: i for i, p in enumerate(FROZEN_MERGES)}
