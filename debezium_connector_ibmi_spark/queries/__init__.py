"""Registry of driver-contract queries: each entry pairs a PySpark
DataFrame builder with an equivalent DuckDB/ANSI SQL oracle, run by
the driver at sf0.01 (see __spark_entry__.py).

Every query realizes a SURVEY.md §2 operator (or a training-pipeline
op the 100 TB use-case needs) over the driver's testdata tables.

The driver's correctness harness verifies at most 50 queries per
round in registry-iteration order, so ordering IS the rotation
policy: an explicit priority list (`_VERIFY_FIRST`, introduced round
5) whose 50 names are exactly the set that MUST get a fresh driver
row this round —
(a) every query new in or changed by this round's code,
(b) every query whose latest driver-green row is two rounds old
    (rotated out by the previous round's cap),
(c) the flagship CDC set (re-verified every round by policy),
(d) the remainder filled with bench-headline doc/corpus ops.
Everything after position 50 is code-unchanged and green in the
PREVIOUS round's file, so nothing is ever verified only by a file
older than the previous round. `tests/test_round5_advice.py` pins
the structural invariants (no dupes, nothing unknown, changed/new
queries inside the cap, previous-round file covers the tail).
"""

from __future__ import annotations

from debezium_connector_ibmi_spark.queries import (
    cdc,
    corpusops,
    discovery_ops,
    embeddingops,
    misc_ops,
    multimodalops,
    parity_ops,
    relational,
    textops,
)

_MODULES = (
    relational, embeddingops, misc_ops, cdc, discovery_ops, corpusops,
    multimodalops, textops, parity_ops,
)

# the driver verifies the first 50 registry entries each round
DRIVER_VERIFY_CAP = 50

# names that must land inside the first DRIVER_VERIFY_CAP positions
# this round, in verification order (see module docstring). Round-6
# rotation: (a) queries new in or changed by round-6 code, (b) the 27
# queries whose latest green row is r04 (rotated out by round 5 —
# they MUST refresh this round to keep the "nothing verified by a
# file older than the previous round" invariant), (c) the flagship
# CDC set (re-verified every round by policy), (d) the heaviest
# bench-headline ops filling the cap. Everything after position 50 is
# code-unchanged and r05-green.
_VERIFY_FIRST = [
    # (a) new/changed in round 6: population-bounded SemDeDup rewrite
    # (new cell semantics + new oracle), BPE merged count (first-ever
    # driver oracle: recursive-CTE bpe() replay), streaming dedup
    # queries (null filtering + await_available_now drain contract),
    # exact substring dedup (NEW operator family this round —
    # operators/substring_dedup.py)
    "emb_semantic_dedup",
    "doc_token_count_bpe_merged",
    "doc_stream_near_dup_verified",
    "doc_stream_exact_dup",
    "emb_stream_semantic_flags",
    "doc_dup_spans",
    "doc_dup_spans_incremental",
    "doc_substring_dedup",
    # (b) last green row is r04: corpus ops
    "doc_pii_scrub",
    "doc_sample_stratified",
    "doc_length_histogram",
    "doc_chunk_dedup",
    "doc_split_assign",
    "doc_repetition_ratio",
    "doc_url_normalize",
    # (b) last green row is r04: multimodal
    "mm_image_meta",
    "mm_audio_features",
    "mm_frame_sample",
    # (b) last green row is r04: text analysis
    "doc_scrub_control_chars",
    "doc_chunk_tokens",
    "doc_top_terms",
    "doc_quality_percentiles",
    "doc_token_count",
    "doc_token_count_bpe",
    "doc_quality_score",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_winnow_fingerprints",
    "doc_ngram_jaccard_pairs",
    # (b) last green row is r04: functions + cdc planning
    "fn_century_decode",
    "fn_charset_decode",
    "fn_bigint_from_text",
    "fn_default_coalesce",
    "cdc_usable_chain",
    "cdc_plan_ranges",
    # (c) flagship CDC set (every round)
    "cdc_last_per_key_salted",
    "cdc_state_diff",
    "cdc_filter_include",
    "cdc_op_type_map",
    "cdc_resume_predicate",
    "cdc_last_per_key",
    "cdc_pair_before_after",
    "cdc_txn_group",
    "cdc_journal_lag",
    "cdc_event_counters",
    "cdc_envelope_flat",
    "cdc_snapshot_handover",
    "cdc_quarantine_rows",
    "cdc_changelog_materialize",
    "cdc_state_dedup",
    # (d) slots freed for the new substring-dedup family: the three
    # bench-headline fillers (doc_near_dup_verified,
    # doc_lsh_near_dup_pairs, doc_dup_clusters) move past the cap —
    # code-unchanged and r05-green, so the "nothing verified by a
    # file older than the previous round" invariant holds.
]


def _ordered(full: dict) -> dict:
    out = {}
    for name in _VERIFY_FIRST:
        # tolerate names absent from this dict (a query without an
        # oracle is a weaker rows-only driver check); strictness for
        # the queries dict is pinned in tests/test_round5_advice.py
        if name in full:
            out[name] = full[name]
    for name, v in full.items():
        if name not in out:
            out[name] = v
    return out


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _ordered(out)
