"""Population-bounded SemDeDup cells (round-6, VERDICT r5 #1):
hierarchical sign-LSH refinement must bound the within-cell pair
stage by cap, sub-split hot cells consistently, refuse pathological
corpora, and preserve the dedup semantics."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from debezium_connector_ibmi_spark.operators.embedding_dedup import (
    _effective_cells,
    assign_bounded_cells,
    semantic_dedup,
)

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _vec(bits16, tail):
    """64-dim vector whose first 16 sign bits are ``bits16`` and whose
    remaining dims carry ``tail`` (to vary cosine)."""
    v = [(1.0 if (bits16 >> i) & 1 else -1.0) for i in range(16)]
    # integer-valued floats only: exact in float32, so the Spark-side
    # (float -> double) cosine equals the Python-double reference
    return v + [float(t) for t in tail] + [0.0] * (48 - len(tail))


def test_effective_cells_prefers_coarsest_under_cap():
    # two codes sharing a 4-bit prefix, 3 vectors total, cap 4
    counts = [(0b0101, 2), (0b10101, 1)]
    mapping, worst = _effective_cells(counts, (4, 8, 12, 16), cap=4)
    assert mapping == {0b0101: 0b0101, 0b10101: 0b0101}
    assert worst == 3


def test_effective_cells_splits_hot_cell_consistently():
    # 4-bit cell 5 holds 6 vectors (> cap 4) across two 8-bit codes:
    # BOTH must refine to their 8-bit cells (no cross-level mixing)
    counts = [(0b0101, 3), (0b10101, 3)]
    mapping, worst = _effective_cells(counts, (4, 8, 12, 16), cap=4)
    assert mapping == {0b0101: 0b0101, 0b10101: 0b10101}
    assert worst == 3


def test_effective_cells_finest_level_fallback():
    counts = [(7, 10)]  # one exact code over cap: finest level keeps it
    mapping, worst = _effective_cells(counts, (4, 8, 12, 16), cap=4)
    assert mapping == {7: 7}
    assert worst == 10


def test_cell_population_bounded(spark):
    """Skewed corpus: 40 vectors crammed into one 4-bit cell (cap 8)
    must split until every effective cell holds <= cap — the pair
    stage bound sum(pop²) <= n_cells * cap² follows."""
    rows = [
        # 16-bit codes that all share the low 4 bits (cell 0b1111)
        (i, _vec(0b1111 | ((i % 16) << 4) | ((i % 8) << 8), [i % 5]))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = assign_bounded_cells(df, cap=8)
    pops = Counter(r["cell"] for r in out.select("cell").collect())
    assert sum(pops.values()) == 40
    assert max(pops.values()) <= 8
    # pair-stage bound: within-cell pairs are cap-bounded per cell
    assert all(p * (p - 1) // 2 <= 8 * 7 // 2 for p in pops.values())


def test_guard_refuses_unboundable_cell(spark):
    """More identical embeddings than max_cell_population: even the
    finest level cannot split them — the operator must refuse, like
    jaccard_pairs does, instead of going quadratic."""
    rows = [(i, _vec(0b1010, [1])) for i in range(30)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    with pytest.raises(ValueError, match="max_cell_population"):
        assign_bounded_cells(df, cap=4, max_cell_population=10)


def test_semantic_dedup_min_id_policy(spark):
    """Three near-identical vectors in one cell: only the min id
    survives; an orthogonal vector in the same cell survives too."""
    base = _vec(0b0011, [5, 5, 5])
    near = list(base)
    near[20] += 0.001
    other = _vec(0b0011, [0])
    other[30] = -40.0  # decorrelate from base
    df = spark.createDataFrame(
        [(3, base), (7, near), (9, base), (12, other)], EMB_SCHEMA
    )
    out = semantic_dedup(df, threshold=0.9, cap=32)
    assert sorted(r["vec_id"] for r in out.collect()) == [3, 12]


def test_matches_unbounded_semantics_when_cap_not_hit(spark):
    """With cap >= corpus size nothing splits: survivors must equal
    the round-5 (single-level sign-LSH) semantics computed naively."""
    import itertools
    import math

    rows = [(i, _vec(i % 16, [(i * 7) % 11, (i * 3) % 5])) for i in range(60)]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = sorted(
        r["vec_id"] for r in semantic_dedup(df, threshold=0.99, cap=1000).collect()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))),
            6,
        )

    cells: dict[int, list[tuple[int, list[float]]]] = {}
    for i, v in rows:
        cells.setdefault(i % 16, []).append((i, v))
    dropped = set()
    for members in cells.values():
        for (ia, va), (ib, vb) in itertools.combinations(sorted(members), 2):
            if cos(va, vb) >= 0.99:
                dropped.add(ib)
    assert out == sorted(i for i, _ in rows if i not in dropped)


def test_short_vector_fails_loudly(spark):
    """Round-7 ADVICE: a vector shorter than the finest sign-plane
    count must raise (its missing dims would read as 0-bits and merge
    it into the wrong cells silently)."""
    import pytest

    from debezium_connector_ibmi_spark.operators.embedding_dedup import (
        assign_bounded_cells,
    )

    df = spark.createDataFrame(
        [(1, [1.0] * 16), (2, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="sign planes"):
        assign_bounded_cells(df)
