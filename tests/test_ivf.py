"""IVF ANN: recall against brute force on clustered vectors."""

from __future__ import annotations

import numpy as np
import pytest

from aqueduct_core_spark.functions.ivf import assign_lists, ivf_topk, train_centroids
from aqueduct_core_spark.functions.similarity import cosine_topk


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(2)
    centers = rng.standard_normal((6, 24)) * 3
    rows = []
    for i in range(600):
        c = centers[i % 6]
        rows.append((i, [float(x) for x in c + rng.standard_normal(24) * 0.3]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_ivf_recall_vs_bruteforce(spark, clustered):
    df, rows = clustered
    cents = train_centroids(df, n_centroids=8, sample_size=600, seed=7)
    indexed = assign_lists(df, cents).cache()
    indexed.count()

    query = rows[10][1]
    exact = [r["vec_id"] for r in cosine_topk(df, query, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(indexed, cents, query, k=10, nprobe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9  # clustered data, 3 probes -> near-perfect recall

    # nprobe=all lists == exact
    full = [r["vec_id"] for r in ivf_topk(indexed, cents, query, k=10, nprobe=8).collect()]
    assert full == exact


def test_ivf_determinism(spark, clustered):
    df, _ = clustered
    c1 = train_centroids(df, n_centroids=8, sample_size=600, seed=7)
    c2 = train_centroids(df, n_centroids=8, sample_size=600, seed=7)
    assert np.allclose(c1, c2)


def test_ivf_topk_batch_matches_per_query(spark, clustered):
    from aqueduct_core_spark.functions.ivf import ivf_topk_batch

    df, rows = clustered
    cents = train_centroids(df, n_centroids=8, sample_size=600, seed=7)
    indexed = assign_lists(df, cents).cache()
    indexed.count()
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in (10, 77, 300)], "query_id long, query_vec array<float>"
    )
    batch = ivf_topk_batch(indexed, cents, queries, k=5, nprobe=3).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid in (10, 77, 300):
        single = [
            (i + 1, r["vec_id"], r["cosine"])
            for i, r in enumerate(ivf_topk(indexed, cents, rows[qid][1], k=5, nprobe=3).collect())
        ]
        assert sorted(got[qid]) == single
