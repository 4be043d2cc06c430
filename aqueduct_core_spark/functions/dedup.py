"""Deduplication family: exact, token-Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
  * exact:         one hash-groupBy shuffle on a 32-char digest — minimal width.
  * token Jaccard: explode distinct tokens -> self-equijoin on token -> count;
                   quadratic only within identical-token groups (the oracle path
                   for small SF; LSH is the scale path).
  * MinHash+LSH:   signatures via per-seed min over exploded shingles (pure
                   JVM aggregates, no UDF), banded into buckets; candidate pairs
                   only within a bucket -> near-linear.
  * SimHash:       64 bit-sums over exploded token hashes (JVM bit_get), then
                   bit reassembly; hamming-near pairs via band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aqueduct_core_spark.functions.text import tokens


# ------------------------------------------------------------------ exact
def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized-exact) documents: md5(text) -> ids."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per exact-content group."""
    w_digest = F.md5(F.col(text_col))
    keep = (
        df.select(F.col(id_col).alias("_id"), w_digest.alias("digest"))
        .groupBy("digest")
        .agg(F.min("_id").alias("keep_id"))
    )
    return df.join(
        keep, (w_digest == keep["digest"]) & (F.col(id_col) == keep["keep_id"]), "inner"
    ).select(df["*"])


# ------------------------------------------------------------------ jaccard
def token_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (a < b) with Jaccard similarity of distinct token sets >= t.

    Exact (no approximation): explode distinct tokens, self-join on token,
    count shared tokens, |A u B| = |A| + |B| - shared. Output columns:
    (id_a, id_b, jaccard).
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
    )
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    shared = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ minhash
def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per document: for seed s, min over shingles of
    xxhash64(shingle, s). Pure JVM aggregates over one explode — no UDF.
    Output: (id, sig array<long>).

    Tokens are materialized as a column before shingling (see
    text.shingle_array for why), and the input is repartitioned first:
    document tables often arrive as one parquet row group (one task) and
    shingling is the expensive per-row stage."""
    from aqueduct_core_spark.functions.text import shingle_array

    spread = df.sparkSession.sparkContext.defaultParallelism
    ex = (
        df.repartition(spread)
        .select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
        .select("id", F.explode(shingle_array(F.col("_toks"), shingle_n)).alias("sh"))
    )
    mins = [F.min(F.xxhash64(F.col("sh"), F.lit(s))).alias(f"h{s}") for s in range(num_hashes)]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 8,
    verify_threshold: float | None = 0.7,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Band the signatures into buckets; pairs sharing any band-bucket are
    candidates. Estimated Jaccard = fraction of matching signature positions.
    Near-linear: the only shuffles are the band-bucket groupBy and the pair
    dedup — no all-pairs comparison ever materializes.

    max_bucket_size drops over-common buckets (a band value shared by more
    than N docs): such buckets are low-signal (stopword-like shingles) and
    quadratic to expand — the standard production guard that keeps LSH
    near-linear under adversarial corpora. Pass None to disable."""
    n = len(sig_df.select("sig").first()["sig"])
    rows_per_band = n // bands
    banded = sig_df.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    # the signature pipeline (explode shingles + N min-aggs) is expensive and
    # feeds the bucket-count side, the semi-join probe, and both self-join
    # sides — cache the tiny banded table (n_docs x bands rows) so it runs once
    banded = banded.persist()
    if max_bucket_size is not None:
        w_count = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "bucket")
        )
        # plain semi-join (AQE broadcasts when small; at 100 TB the bucket-count
        # side can be huge, so no forced broadcast)
        banded = banded.join(w_count, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(n),
                6,
            ),
        )
        .select("id_a", "id_b", "est_jaccard")
    )
    if verify_threshold is not None:
        pairs = pairs.filter(F.col("est_jaccard") >= verify_threshold)
    # Materialize the (small) pairs result now so the banded cache can be
    # released before returning — persist without unpersist would leak cached
    # blocks across calls in a long-lived session. localCheckpoint truncates
    # the lineage so the returned plan no longer references the cache.
    pairs = pairs.localCheckpoint(eager=True)
    banded.unpersist()
    return pairs


# ------------------------------------------------------------------ simhash
def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: per bit j, sum +-1 over token-frequency-
    weighted token hashes; bit j set iff the sum is positive. All JVM-side
    (explode + 64 conditional sums + bit reassembly). Output: (id, simhash)."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    ex = df.repartition(spread).select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    bit_sums = [
        F.sum(F.when(F.bit_get("h", F.lit(j)) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ]
    agg = ex.groupBy("id").agg(*bit_sums)
    # shiftleft-based bit reassembly (exact on longs)
    acc = F.lit(0).cast("long")
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = acc.bitwiseOR(F.shiftleft(bit, j))
    return agg.select("id", acc.alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: band the 64 bits into `bands` chunks;
    any pair within hamming distance < bands must share a chunk (pigeonhole),
    so candidates come from chunk-equality joins only. Over-common chunks are
    dropped (same near-linearity guard as MinHash LSH)."""
    width = 64 // bands
    chunks = sim_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("simhash", b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk"),
                )
                for b in range(bands)
            ])
        ).alias("bc"),
    ).select("id", "simhash", "bc.band", "bc.chunk")
    chunks = chunks.persist()  # same reuse pattern as lsh_candidate_pairs
    if max_bucket_size is not None:
        ok = (
            chunks.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "chunk")
        )
        chunks = chunks.join(ok, ["band", "chunk"], "left_semi")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("s_a"),
            F.col("b.simhash").alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    # same cache-release pattern as lsh_candidate_pairs
    out = out.localCheckpoint(eager=True)
    chunks.unpersist()
    return out
