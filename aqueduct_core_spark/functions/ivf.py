"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

Classic two-level ANN: k-means centroids partition the vector space; each
vector lands in its nearest centroid's list; a query probes only the
`nprobe` nearest lists. Complements the LSH path in similarity.py.

Scale design: centroids are trained on a driver-side SAMPLE (k-means over a
few thousand vectors in numpy — the standard practice even at billion-vector
scale), then broadcast; assignment is one Arrow-batched pandas UDF pass
(numpy argmin over a matmul per batch); the search probes nprobe lists via a
partition-pruning filter on the assignment column. On a real table the
assignment column is written once and bucket-partitions the index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from aqueduct_core_spark.functions.similarity import cosine


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side mini k-means on a deterministic sample. Returns (k, dim).

    The sample is a TakeOrdered by xxhash64 of the ID column — a cheap
    fixed-width hash per row (the earlier form hashed to_json of the whole
    vector, taxing every row with a full serialization just to pick a few
    thousand samples)."""
    sample = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))  # deterministic shuffle, cheap key
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r[0] for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def assign_lists(df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add `ivf_list`: nearest-centroid id per vector (one numpy matmul per
    Arrow batch)."""
    cents = centroids.T.copy()  # (dim, k)

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cents).argmax(axis=1).astype(np.int32))

    return df.withColumn("ivf_list", nearest(F.col(vec_col)))


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine, scanning only the nprobe nearest inverted lists."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ q))[:nprobe].tolist()
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        indexed.filter(F.col("ivf_list").isin(probe))  # list pruning
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_topk_batch(
    indexed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Batched IVF top-k: probe MANY query vectors in one pass — what a real
    pipeline runs (one job per query would pay a full scan each).

    Plan: assign each query its nprobe nearest lists (one tiny pandas-UDF pass
    over the query table), explode to (query, list) probe rows, broadcast-join
    against the indexed corpus on ivf_list — so each query only ever meets the
    vectors in its probed lists — then per-query top-k via a window rank over
    the (query, list)-pruned candidates. Output (query_id, vec_id, cosine,
    rank)."""
    from pyspark.sql import Window

    cents = centroids.copy()  # (k_lists, dim)

    @pandas_udf("array<int>")
    def probe_lists(qvecs: pd.Series) -> pd.Series:
        m = np.asarray(qvecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cents.T  # (nq, k_lists)
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    probes = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
        F.explode(probe_lists(F.col(qvec_col))).alias("ivf_list"),
    )
    cand = indexed.join(F.broadcast(probes), "ivf_list").select(
        "qid",
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), F.col("qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(qid_col), id_col, "cosine", "rank")
    )
