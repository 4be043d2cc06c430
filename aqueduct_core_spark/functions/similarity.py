"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:
  * brute-force cosine top-k — exact baseline; one scan + one top-k reduce,
    all JVM-side (F.aggregate/zip_with dot products inside codegen).
  * LSH-bucketed ANN — random-hyperplane signatures via an Arrow-batched
    pandas UDF (numpy matmul over whole record batches, the mandated
    vectorized path); candidate generation is bucket-equality joins, so the
    all-pairs comparison never materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Single narrow scan, score
    computed in codegen, then a global top-k (orderBy+limit -> Spark's
    TakeOrderedAndProject, no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs by cosine >= threshold (brute-force all-pairs;
    the oracle baseline — use the LSH path at scale)."""
    n = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_bucket_ids(dim: int, nbits: int = 16, seed: int = 42):
    """Vectorized random-hyperplane LSH bucketer: a pandas UDF computing the
    sign-bit signature of each vector against `nbits` fixed hyperplanes with a
    single numpy matmul per Arrow batch (no per-row Python)."""
    hyper = np.random.RandomState(seed).standard_normal((dim, nbits))

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (m @ hyper) > 0  # (batch, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def ann_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    nbits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: LSH-bucket, compare only within buckets,
    verify with exact cosine. Recall < 1 by construction (scale path)."""
    bucket = lsh_bucket_ids(dim, nbits, seed)
    n = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
