"""Auto-sized hyperplane LSH (VERDICT r3 task 1).

The sizing rule nbits = max(8, ceil(log2(n / target_bucket))) lived only in
PLANS.md; callers who didn't read it got quadratic candidate growth. It is now
the in-engine default (similarity.auto_lsh_size, applied when
ann_neardup_pairs is called without explicit nbits). These tests pin:

  * the formula itself (incl. the n_tables-grows-with-nbits recall rule);
  * on a corpus big enough that auto-sizing kicks in (nbits > 8), the
    auto-sized path returns the IDENTICAL verified pair set to the pinned
    nbits=8 configuration while generating strictly FEWER candidate pairs
    (the deterministic proxy for the measured sf1 wall-time win — 2.9x,
    PLANS.md);
  * at the contract query's sf0.01 scale (500 vectors) auto resolves to
    exactly the pinned (8, 4), which is what lets `ann_neardup_lsh_auto`
    share the constant-embedding DuckDB oracle twin.
"""

from __future__ import annotations

import numpy as np
import pytest

from aqueduct_core_spark.functions.similarity import (
    _candidate_pairs,
    ann_neardup_pairs,
    auto_lsh_size,
)

DIM = 64
N_BASE = 12_000  # auto_lsh_size -> nbits 9 > base 8
N_PLANTED = 80


def test_auto_lsh_size_formula():
    # contract-scale corpus: stays at the pinned base (8 bits, 4 tables)
    assert auto_lsh_size(500) == (8, 4)
    # floor: tiny corpora never go below base
    assert auto_lsh_size(1) == (8, 4)
    assert auto_lsh_size(0) == (8, 4)
    # sf1-scale: the measured-faster point from PLANS.md (nbits 11)
    assert auto_lsh_size(50_000) == (11, 7)
    # 10^9 docs: 25 bits, 33M buckets — occupancy stays ~target
    nbits, ntab = auto_lsh_size(1_000_000_000)
    assert nbits == 25 and ntab == 21
    # monotone non-decreasing in n
    sizes = [auto_lsh_size(n)[0] for n in (10, 1_000, 10_000, 10**6, 10**9)]
    assert sizes == sorted(sizes)
    # threshold-aware recall matching: tables grow by (1/p_bit)^extra_bits,
    # p_bit = 1 - arccos(t)/pi — steep at loose thresholds, gentle for true
    # near-dups (measured: the linear rule dropped 35% of the t=0.4 pair set
    # at 20k vectors; the matched rule holds the recall curve at the threshold)
    assert auto_lsh_size(20_000, threshold=0.4) == (10, 11)
    assert auto_lsh_size(50_000, threshold=0.95) == (11, 6)
    # growth is capped (candidate volume still shrinks 2x per bit)
    assert auto_lsh_size(10**9, threshold=0.1)[1] == 32


def _corpus(spark):
    """Deterministic corpus with planted near-identical pairs: N_BASE random
    unit vectors plus N_PLANTED tiny-perturbation twins (cosine >= 0.9995, far
    above the 0.9 threshold, so every table finds them at either bucketing —
    recall differences can't leak into the verified set)."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twins = base[:N_PLANTED] + 0.01 * rng.standard_normal((N_PLANTED, DIM))
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    vecs = np.vstack([base, twins])
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


@pytest.fixture(scope="module")
def corpus(spark):
    df = _corpus(spark).persist()
    df.count()
    yield df
    df.unpersist()


def test_auto_sized_equals_pinned_with_fewer_candidates(spark, corpus):
    n = corpus.count()
    nbits_auto, ntab_auto = auto_lsh_size(n, threshold=0.9)  # what auto uses
    assert nbits_auto > 8  # auto-sizing actually engaged at this scale

    pinned = ann_neardup_pairs(
        corpus, dim=DIM, threshold=0.9, nbits=8, n_tables=4, seed=42
    )
    auto = ann_neardup_pairs(corpus, dim=DIM, threshold=0.9, seed=42)

    pinned_set = {(r["id_a"], r["id_b"]) for r in pinned.collect()}
    auto_set = {(r["id_a"], r["id_b"]) for r in auto.collect()}

    planted = {(i, N_BASE + i) for i in range(N_PLANTED)}
    assert planted <= pinned_set
    assert auto_set == pinned_set  # identical verified output

    # deterministic efficiency proxy for the sf1 wall-time win: the auto
    # bucketing generates strictly fewer candidate pairs to verify
    cand_pinned = _candidate_pairs(corpus, DIM, 8, 42, 4, "vec_id", "embedding").count()
    cand_auto = _candidate_pairs(
        corpus, DIM, nbits_auto, 42, ntab_auto, "vec_id", "embedding"
    ).count()
    assert cand_auto < cand_pinned


def test_contract_query_auto_resolves_to_pinned_constants():
    """ann_neardup_lsh_auto shares ann_neardup_lsh's oracle twin because at
    sf0.01 the 500-vector corpus auto-sizes to the twin's embedded constants."""
    import __spark_entry__ as entry

    assert auto_lsh_size(500) == (entry.ANN_NBITS, entry.ANN_TABLES)
    assert entry.oracle_sql()["ann_neardup_lsh_auto"] == entry.oracle_sql()["ann_neardup_lsh"]
