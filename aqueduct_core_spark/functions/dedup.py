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
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with Jaccard similarity of distinct token sets >= t.

    Exact (no approximation): explode distinct tokens, self-join on token,
    count shared tokens, |A u B| = |A| + |B| - shared. Output columns:
    (id_a, id_b, jaccard).

    max_doc_freq is the scale guard: a token present in k documents produces
    k^2 rows in the self-join, so ONE stopword-like token surviving
    tokenization across a billion docs is a cartesian bomb. Tokens with
    document frequency > max_doc_freq are dropped from the token SETS (both
    the join and the set sizes — "stopword-free Jaccard"), the same
    rationale as the LSH paths' max_bucket_size. Pass None for the unguarded
    small-SF/oracle form.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
    )
    if max_doc_freq is not None:
        rare = (
            tok.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("tok")
        )
        tok = tok.join(rare, "tok", "left_semi")
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
    n_hashes: int | None = None,
    include_estimate: bool = True,
) -> DataFrame:
    """Band the signatures into buckets; pairs sharing any band-bucket are
    candidates. Estimated Jaccard = fraction of matching signature positions.
    Near-linear: the only shuffles are the band-bucket groupBy and the pair
    dedup — no all-pairs comparison ever materializes.

    max_bucket_size drops over-common buckets (a band value shared by more
    than N docs): such buckets are low-signal (stopword-like shingles) and
    quadratic to expand — the standard production guard that keeps LSH
    near-linear under adversarial corpora. Pass None to disable.

    n_hashes: signature length; pass it when known to skip a driver-side
    first() that otherwise executes the whole signature pipeline once just to
    measure the array. include_estimate=False (only valid when
    verify_threshold is None) skips est_jaccard and drops the sig arrays
    before the pair-dedup exchange — for callers that re-verify candidates
    exactly and never read the estimate (guide §2.3: shuffle fewer bytes)."""
    if not include_estimate and verify_threshold is not None:
        raise ValueError("include_estimate=False requires verify_threshold=None")
    n = n_hashes if n_hashes is not None else len(sig_df.select("sig").first()["sig"])
    rows_per_band = n // bands
    sig_cols = ["id", "sig"] if include_estimate else ["id"]
    banded = sig_df.select(
        *sig_cols,
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
    ).select(*sig_cols, "bb.band", "bb.bucket")
    # The signature pipeline (explode shingles + N min-aggs) is expensive and
    # feeds the bucket-count side and both self-join sides. Materialize ONCE,
    # eagerly: a lazy persist() lets those branches race cache population
    # inside one job and recompute the upstream pipeline per branch (same
    # finding as simhash_near_pairs_words, measured 2x+ at sf1).
    banded = banded.localCheckpoint(eager=True)
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
    # self-join of the full banded table on both sides: force shuffled-hash
    # (broadcast-building one whole side measured slower at sf1 and is
    # impossible at scale — same rationale as simhash_near_pairs_words)
    banded = banded.hint("shuffle_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    )
    if not include_estimate:
        return (
            joined.select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    pairs = (
        joined.select(
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
    return pairs


def minhash_lsh_verified_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """MinHash-LSH candidates VERIFIED with exact shingle-set Jaccard.

    The production near-dup shape: candidate generation is the near-linear
    banded LSH (no all-pairs join ever materializes), then only the candidate
    pairs — a vanishing fraction of all pairs — are re-checked against their
    exact distinct-shingle Jaccard. Output (id_a, id_b, jaccard) contains no
    false positives by construction; recall is governed by the band/row
    choice (bands=16 over 32 hashes → rows=2: a pair at Jaccard s survives
    with p = 1-(1-s^2)^16, >0.999999 for s >= 0.7).

    Only documents with >= shingle_n tokens participate (shorter docs have no
    full shingle) — mirrored by the ANSI oracle twin.

    Perf notes (r6, guide §2.5/§4 — output unchanged):
      * document tables often arrive as ONE parquet row group (one scan task),
        and the size(_toks) filter inlines the tokenize expression and pushes
        it below the repartition INTO that single-task scan — so the whole
        regex tokenize ran serially (measured 3.5s of the 9.6s query at sf1).
        The eager localCheckpoint right after the repartition+tokenize is a
        pushdown barrier: tokenize runs once, spread across cores, and the
        filter/shingle stages read the materialized arrays;
      * shingling itself is cheap (~0.1s at sf1), so the checkpoint replaces
        the shs persist() (branches re-shingle from the checkpoint instead of
        racing a lazy cache);
      * n_hashes is passed down so lsh_candidate_pairs skips its driver-side
        first() (which executed the whole signature pipeline once), and
        include_estimate=False drops the sig arrays from the pair-dedup
        exchange — this caller re-verifies with exact Jaccard and never reads
        the estimate."""
    from aqueduct_core_spark.functions.text import shingle_array

    spread = df.sparkSession.sparkContext.defaultParallelism
    toked = (
        df.repartition(spread)
        .select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
        .localCheckpoint(eager=True)
        .filter(F.size("_toks") >= shingle_n)
    )
    shs = toked.select("id", shingle_array(F.col("_toks"), shingle_n).alias("shs"))
    ex = shs.select("id", F.explode("shs").alias("sh"))
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(s))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    sigs = ex.groupBy("id").agg(*mins).select(
        "id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )
    cands = lsh_candidate_pairs(
        sigs,
        bands=bands,
        verify_threshold=None,
        max_bucket_size=max_bucket_size,
        n_hashes=num_hashes,
        include_estimate=False,
    )
    # Verification joins: the shingle-set side is heavy (O(corpus) rows of
    # ~KB arrays) while the candidate-pair side is light, so force a
    # shuffled-hash join instead of letting the planner broadcast-build two
    # multi-MB set relations (guide §3.1; measured at sf1: 194k candidates
    # vs 50k x ~1KB sets, verification 2.6s BHJ -> 0.9s SHJ, and at 100 TB
    # the set side could never broadcast anyway — per-partition build stays
    # bounded because rows are capped-size shingle arrays).
    a_sets = shs.select(F.col("id").alias("id_a"), F.col("shs").alias("_sa")).hint(
        "shuffle_hash"
    )
    b_sets = shs.select(F.col("id").alias("id_b"), F.col("shs").alias("_sb")).hint(
        "shuffle_hash"
    )
    shared = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - shared
    return (
        cands.join(a_sets, "id_a")
        .join(b_sets, "id_b")
        .withColumn("jaccard", F.round(shared / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


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


def simhash_words(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Engine-portable 64-bit SimHash as two 32-bit words (sim_hi, sim_lo).

    Same shape as simhash64 but the per-token 64-bit hash comes from the first
    16 hex digits of md5(token) (each digit contributing 4 bits) instead of
    xxhash64 — md5, position(), >>, & and integer sums are bit-identical
    between Spark and ANSI SQL engines, so the whole computation has an exact
    DuckDB twin (__spark_entry__.oracle_sql: dedup_simhash_pairs). Two 32-bit
    words instead of one 64-bit value keep every intermediate below 2^32 so
    no engine's signed-overflow rules are ever in play.

    All JVM-side: explode + per-occurrence md5 + 64 ±1 sums + arithmetic
    reassembly, in ONE exchange. (An earlier form pre-aggregated
    groupBy(id, tok) counts to save md5 calls on repeated tokens — that spent
    a full extra 2.5M-row shuffle+hash-agg to avoid ~8% of cheap md5 work,
    guide §2.4; sum over occurrences of ±1 == ±count, so dropping it is
    bit-identical to the counted form and to the SQL twin. Map-side partial
    aggregation collapses each doc to one 64-column row before the exchange,
    so the remaining shuffle carries n_docs rows, not n_tokens.)"""
    spread = df.sparkSession.sparkContext.defaultParallelism
    ex = (
        df.repartition(spread)
        .select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .withColumn("_h", F.md5("tok"))
        .select(
            "id",
            *[
                F.expr(
                    f"position(substring(_h, {k + 1}, 1) IN '0123456789abcdef') - 1"
                ).alias(f"v{k}")
                for k in range(16)
            ],
        )
    )

    def bit(j: int):
        return F.shiftright(F.col(f"v{j // 4}"), j % 4).bitwiseAND(F.lit(1))

    bit_sums = [
        F.sum(F.when(bit(j) == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"b{j}")
        for j in range(64)
    ]
    agg = ex.groupBy("id").agg(*bit_sums)

    def word(lo_bit: int):
        acc = F.lit(0).cast("long")
        for j in range(lo_bit, lo_bit + 32):
            acc = acc + F.when(
                F.col(f"b{j}") > 0, F.lit(1 << (j - lo_bit)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc

    return agg.select("id", word(32).alias("sim_hi"), word(0).alias("sim_lo"))


def simhash_near_pairs_words(
    sim_df: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int | None = None,
    fat_bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs over (sim_hi, sim_lo) SimHash words with a recall
    GUARANTEE: bands > max_hamming means any pair within the hamming budget
    has fewer differing bits than bands, so some band is identical in both
    (pigeonhole) — the output is EXACTLY the set of pairs with hamming <=
    max_hamming (modulo an optional over-common-bucket guard; pass None to
    keep the guarantee unconditional). Output (id_a, id_b, hamming).

    fat_bucket_cap is the EXACTNESS-PRESERVING scale guard (unlike
    max_bucket_size, which drops buckets and loses pairs). The band-chunk
    space is only 2^(64/bands) values, so in-bucket pairs grow quadratically
    with corpus size (measured: 10x docs -> 25x wall at sf1). Buckets larger
    than the cap are instead joined on a SECOND matching band: with 8 bands
    and <= max_hamming=6 differing bits, at most 6 bands can differ, so every
    qualifying pair shares at least TWO bands (pigeonhole again) — joining
    fat-bucket members on (band, chunk, second_band, second_chunk) subdivides
    each fat bucket ~2^width-fold and misses nothing. (Beyond ~10^9 docs the
    second level goes fat too; the budget 8 bands / hamming 6 guarantees only
    two matches, so deeper subdivision needs a lossy cap or more bands.)

    Perf notes (r6, guide §2.3/§2.4 — output provably unchanged):
      * the hamming predicate rides INSIDE the candidate joins, so only
        qualifying pairs reach the dropDuplicates exchange (measured at sf1:
        the fat join emitted 243.6M rows, 87.4M after dedup, 648k after the
        hamming filter — filtering first removes the 243M-row shuffle);
      * the fat path's second band is restricted to band2 > band: every
        qualifying all-fat pair has >= 2 matching bands i < j and is caught
        with primary i / second j, while any pair with a thin matching band
        is caught by the thin join — so one ordering suffices (halves the
        fat2 explode AND kills the (i,j)/(j,i) duplicate pair stream);
      * the (8n)-row chunks table is localCheckpoint-ed eagerly instead of
        persist()-ed lazily: the counts/thin/fat branches previously raced
        cache population inside one job and recomputed the upstream simhash
        pipeline per branch (measured: full query 58.5s vs 3.5s signatures +
        24s pairing when materialized separately)."""
    if bands <= max_hamming and max_bucket_size is None:
        raise ValueError(
            f"bands={bands} <= max_hamming={max_hamming} loses the pigeonhole "
            "recall guarantee"
        )
    if fat_bucket_cap is not None and bands < max_hamming + 2:
        raise ValueError(
            f"fat-bucket recursion needs bands >= max_hamming + 2 "
            f"(two guaranteed matching bands); got bands={bands}, "
            f"max_hamming={max_hamming}"
        )
    assert 64 % bands == 0
    width = 64 // bands
    mask = (1 << width) - 1

    def chunk(b: int):
        lo_bit = b * width
        if lo_bit >= 32:
            return F.shiftrightunsigned("sim_hi", lo_bit - 32).bitwiseAND(F.lit(mask))
        return F.shiftrightunsigned("sim_lo", lo_bit).bitwiseAND(F.lit(mask))

    chunks = sim_df.select(
        "id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), chunk(b).alias("chunk"))
                for b in range(bands)
            ])
        ).alias("bc"),
    ).select("id", "sim_hi", "sim_lo", "bc.band", "bc.chunk")
    # Materialize ONCE, eagerly: counts/thin/fat all branch off this table and
    # a lazy persist() lets concurrent branches race the cache and recompute
    # the whole upstream simhash pipeline per branch (measured 2x+ at sf1).
    chunks = chunks.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        ok = (
            chunks.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "chunk")
        )
        chunks = chunks.join(ok, ["band", "chunk"], "left_semi")

    # hamming distance as a join-side predicate: evaluated inside the join so
    # non-qualifying candidates never reach the dedup exchange
    hamming_expr = (
        F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
        + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo")))
    ).cast("int")

    def pair_cols():
        return [
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming_expr.alias("hamming"),
        ]

    if fat_bucket_cap is not None:
        counts = chunks.groupBy("band", "chunk").agg(F.count(F.lit(1)).alias("_n"))
        fat_keys = counts.filter(F.col("_n") > fat_bucket_cap).select("band", "chunk")
        thin = chunks.join(fat_keys, ["band", "chunk"], "left_anti")
        fat = chunks.join(fat_keys, ["band", "chunk"], "left_semi")
        # Both self-join sides are the full O(bands*n) chunk table, so force a
        # shuffled-hash join: letting the planner broadcast-build a multi-MB
        # hash relation of the whole side measured 6.3s vs 1.6s at sf1
        # (guide §3.1), and at scale the sides could never broadcast.
        thin = thin.hint("shuffle_hash")
        a, b = thin.alias("a"), thin.alias("b")
        thin_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id"))
            & (hamming_expr <= max_hamming),
        ).select(*pair_cols())
        # fat path: subdivide by a second band's chunk (recomputed from the
        # words — the bands partition the 64 bits, so "the other bands" ARE
        # the sub-bands of the remaining bits). band2 > band is lossless:
        # every qualifying pair matches on >= 2 bands i < j, and either some
        # matching band's bucket is thin (thin join catches it) or the pair
        # is all-fat on i and caught with primary i / second j.
        fat2 = fat.select(
            "id",
            "sim_hi",
            "sim_lo",
            "band",
            "chunk",
            F.explode(
                F.array(*[
                    F.struct(F.lit(j).alias("band2"), chunk(j).alias("chunk2"))
                    for j in range(bands)
                ])
            ).alias("sb"),
        ).filter(F.col("sb.band2") > F.col("band")).select(
            "id", "sim_hi", "sim_lo", "band", "chunk", "sb.band2", "sb.chunk2"
        ).hint("shuffle_hash")
        fa, fb = fat2.alias("a"), fat2.alias("b")
        fat_pairs = fa.join(
            fb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.band2") == F.col("b.band2"))
            & (F.col("a.chunk2") == F.col("b.chunk2"))
            & (F.col("a.id") < F.col("b.id"))
            & (hamming_expr <= max_hamming),
        ).select(*pair_cols())
        cand = thin_pairs.unionByName(fat_pairs).dropDuplicates(["id_a", "id_b"])
    else:
        chunks = chunks.hint("shuffle_hash")  # same rationale as the fat path
        a, b = chunks.alias("a"), chunks.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.chunk") == F.col("b.chunk"))
                & (F.col("a.id") < F.col("b.id"))
                & (hamming_expr <= max_hamming),
            )
            .select(*pair_cols())
            .dropDuplicates(["id_a", "id_b"])
        )
    return cand.select("id_a", "id_b", "hamming")


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
    # same reuse + separate-handle pattern as lsh_candidate_pairs
    cached = chunks.persist()
    chunks = cached
    if max_bucket_size is not None:
        ok = (
            cached.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "chunk")
        )
        chunks = cached.join(ok, ["band", "chunk"], "left_semi")
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
    cached.unpersist()
    return out


# ------------------------------------------------------- connected components
def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Near-dup clusters from a pair list: every node -> min node id reachable
    through the pair graph (its canonical representative). Pairs alone don't
    dedup a corpus — transitive near-dups (A~B, B~C, A!~C) must collapse into
    ONE keep decision, which is exactly connected components over the pair
    graph (the reference's LWW collapse is the per-KEY analog; this is the
    cross-document one a training-data pipeline needs after MinHash/SimHash).

    Scale design (100 TB): iterative min-label propagation with pointer
    jumping (label <- label[label] each round, the Shiloach-Vishkin / MapReduce
    "hash-to-min" family — Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14). Per round: one edge-join + groupBy (shuffle on node
    id) and one label self-join; pointer jumping collapses chains
    geometrically, so rounds ~ O(log(diameter)) — near-dup clusters are
    star-like, typically 2-4 rounds. Each round is localCheckpoint-ed: without
    it the plan doubles per iteration and Catalyst analysis time blows up
    long before the data does (on a cluster you'd checkpoint to reliable
    storage instead). Convergence is detected with a single scalar aggregate —
    labels only ever decrease, so sum(label) is strictly monotone and equal
    iff fixpoint — no extra join, no collect of per-node state.

    Returns (id_col, rep_id): one row per node in `nodes`, singletons mapping
    to themselves.
    """
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    # Pin the (possibly expensive: MinHash/SimHash/Jaccard) pair plan once so
    # every iteration re-reads a materialized edge list, not the generator.
    edges = edges.localCheckpoint(eager=True)

    lab = (
        nodes.select(F.col(id_col).alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    prev_sum = lab.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s")).first()["s"]
    for _ in range(max_iter):
        # propagate: label(v) <- min(label(v), min over neighbors' labels)
        nbr = (
            edges.join(
                lab.select(F.col("v").alias("bv"), F.col("label").alias("blabel")),
                F.col("b") == F.col("bv"),
            )
            .groupBy("a")
            .agg(F.min("blabel").alias("nbr_min"))
        )
        new = lab.join(nbr, lab["v"] == nbr["a"], "left").select(
            "v",
            F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias("label"),
        )
        # pointer jump: label(v) <- label(label(v)) — halves chain depth
        hop = new.select(F.col("v").alias("lv"), F.col("label").alias("llabel"))
        new = new.join(hop, new["label"] == hop["lv"], "left").select(
            "v", F.coalesce(F.col("llabel"), F.col("label")).alias("label")
        )
        new = new.localCheckpoint(eager=True)
        cur_sum = new.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s")).first()["s"]
        lab = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return lab.select(F.col("v").alias(id_col), F.col("label").alias("rep_id"))


def dedup_assignments(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Corpus dedup decision table: (doc_id, rep_id, cluster_size, keep).
    keep = (doc_id == rep_id) — the min-id document survives, transitive
    near-dups collapse with it. cluster_size rides one extra shuffle on
    rep_id (a window count), which the downstream quality-weighted sampling
    needs anyway."""
    from pyspark.sql import Window

    asgn = connected_components(pairs, docs, id_col=id_col, a_col=a_col, b_col=b_col)
    w = Window.partitionBy("rep_id")
    return asgn.select(
        id_col,
        "rep_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col(id_col) == F.col("rep_id")).alias("keep"),
    )
