"""Training-dataset builder over the transcript table.

The consumer side of the engine: turn the CDC-maintained transcript table into
training shards — pack each conversation into one ordered document, score and
filter quality, drop exact/near duplicates, and plan token-budgeted shards.
Every stage is a declarative plan (one shuffle per stage boundary).

Scale notes: packing groups by conv_id (same key the table is bucketed on —
co-located, no extra shuffle on an Iceberg bucket-partitioned table); shard
planning uses a running token sum, which at 100 TB becomes a two-level plan
(per-partition sums -> prefix offsets broadcast back), the standard
distributed prefix-sum shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aqueduct_core_spark.functions.text import quality_score, token_count


def pack_conversations(transcripts: DataFrame) -> DataFrame:
    """One row per conversation: turns concatenated in stable turn order
    (the per-turn-ordering invariant), with role prefixes."""
    turn = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    packed = (
        transcripts.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(turn)).alias("_turns"))
        .select(
            "conv_id",
            F.array_join(
                F.transform(
                    F.col("_turns"),
                    lambda s: F.concat_ws(": ", s["role"], F.coalesce(s["text"], F.lit(""))),
                ),
                "\n",
            ).alias("document"),
            F.size("_turns").alias("n_turns"),
        )
    )
    return packed


def score_and_filter(packed: DataFrame, min_quality: float = 0.2, min_tokens: int = 4) -> DataFrame:
    c = F.col("document")
    scored = packed.select(
        "*",
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
    )
    return scored.filter((F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens))


def drop_exact_duplicates(df: DataFrame, text_col: str = "document", id_col: str = "conv_id") -> DataFrame:
    keep = (
        df.select(F.md5(F.col(text_col)).alias("_d"), F.col(id_col).alias("_k"))
        .groupBy("_d")
        .agg(F.min("_k").alias("_keep"))
    )
    return (
        df.join(
            keep,
            (F.md5(F.col(text_col)) == keep["_d"]) & (F.col(id_col) == keep["_keep"]),
        )
        .drop("_d", "_keep")
    )


def plan_shards_single(df: DataFrame, tokens_per_shard: int, order_col: str = "conv_id") -> DataFrame:
    """Reference form of the shard planner: ONE global window. Executes as an
    Exchange SinglePartition — one task sorts and scans the whole corpus, so
    this is strictly the small-data / oracle-twin form. plan_shards (below) is
    the production path; tests assert the two produce identical assignments."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(tokens_per_shard)).cast(
            "int"
        ),
    )


def _range_chunk_bounds(df: DataFrame, order_col: str, n_chunks: int, sample_size: int = 4096):
    """Deterministic range boundaries over order_col: sample keys by hash order
    (stable across runs — no RNG), sort, take n_chunks-1 evenly spaced cut
    points. One narrow scan of the key column."""
    keys = [
        r[0]
        for r in df.select(order_col)
        .orderBy(F.xxhash64(F.col(order_col).cast("string")))
        .limit(sample_size)
        .collect()
    ]
    keys.sort()
    if len(keys) < 2 or n_chunks < 2:
        return []
    step = len(keys) / n_chunks
    bounds = sorted({keys[int(i * step)] for i in range(1, n_chunks)})
    return bounds


def _chunk_expr(order_col: str, bounds: list):
    """chunk = number of bounds <= key (monotone in order_col, so chunk ranges
    are contiguous and chunk-local order + offsets reproduce the global order)."""
    chunk = F.lit(0)
    for b in bounds:
        chunk = chunk + F.when(F.col(order_col) >= F.lit(b), 1).otherwise(0)
    return chunk


def _refined_bounds(
    df: DataFrame,
    order_col: str,
    n_chunks: int,
    cap_factor: float = 4.0,
    max_refine_rounds: int = 2,
):
    """Chunk bounds with a heavy-hitter guard. The sampled bounds can land one
    chunk with the bulk of the corpus (a hot order_col value owning a large
    row share collapses its surrounding sample cut points); the chunk window
    would then serialize it. Guard: cap rows per chunk at cap_factor x
    corpus/n_chunks; any over-cap chunk is re-split by re-sampling WITHIN its
    bound range. A chunk holding a single distinct key cannot be range-split
    (chunk must stay a monotone function of the key) — refinement isolates
    such a key into its own chunk, which is the floor for a range planner.

    Returns (bounds, stats) where stats[chunk] = (token_total, row_count) for
    the FINAL bounds — computed in the same aggregate the refinement used, so
    the common (balanced) case costs exactly one scan."""
    import math

    bounds = _range_chunk_bounds(df, order_col, n_chunks)
    if not bounds:
        return [], {}
    stats: dict = {}
    for round_ in range(max_refine_rounds + 1):
        chunked = df.withColumn("_chunk", _chunk_expr(order_col, bounds))
        stats = {
            r["_chunk"]: (r["_tot"], r["_n"])
            for r in chunked.groupBy("_chunk")
            .agg(F.sum("n_tokens").alias("_tot"), F.count(F.lit(1)).alias("_n"))
            .collect()
        }
        n_rows = sum(n for _, n in stats.values())
        cap = max(1.0, cap_factor * n_rows / n_chunks)
        over = [c for c, (_, n) in stats.items() if n > cap]
        if not over or round_ == max_refine_rounds:
            break
        new_bounds = set(bounds)
        for c in over:
            lo = bounds[c - 1] if c > 0 else None
            hi = bounds[c] if c < len(bounds) else None
            sub = df
            if lo is not None:
                sub = sub.filter(F.col(order_col) >= F.lit(lo))
            if hi is not None:
                sub = sub.filter(F.col(order_col) < F.lit(hi))
            splits = int(math.ceil(stats[c][1] / cap)) + 1
            new_bounds.update(_range_chunk_bounds(sub, order_col, splits))
        if new_bounds == set(bounds):
            break  # remaining over-cap chunks are single heavy keys
        bounds = sorted(new_bounds)
    return bounds, stats


def effective_shard_budget(total_tokens: int, tokens_per_shard: int) -> int:
    """Shard-boundary hint from corpus totals: the budget that splits
    total_tokens into the whole number of shards CLOSEST to the requested
    size, so no runt last shard. floor(cumsum/budget) with the literal budget
    leaves a final shard holding total % budget tokens — anywhere in
    (0, budget], i.e. up to -100% off target; with the rounded budget every
    shard (including the last) lands within ±(max_doc + budget/n_shards/2)
    of the requested size."""
    total = max(0, int(total_tokens))
    n_shards = max(1, round(total / max(1, tokens_per_shard)))
    import math

    return max(1, math.ceil(total / n_shards))


def plan_shards(
    df: DataFrame,
    tokens_per_shard: int,
    order_col: str = "conv_id",
    n_chunks: int | None = None,
    balance: bool = False,
) -> DataFrame:
    """Deterministic token-budgeted shard assignment: running token sum in a
    stable order, shard_id = floor((cumsum - n) / budget).

    Distributed prefix sum (no global window, no Exchange SinglePartition):
      1. deterministic range-chunk the corpus on order_col (sampled bounds,
         heavy-hitter-guarded — see _refined_bounds);
      2. per-chunk token totals — one tiny aggregate (n_chunks rows) collected
         on the driver;
      3. exclusive prefix offsets per chunk broadcast back as a literal map;
      4. chunk-local running sum via Window.partitionBy(chunk) — each chunk
         sorts independently in its own task.
    Identical output to plan_shards_single for any input (asserted in
    tests/test_pipeline.py); scales as max(chunk) not sum(corpus). The same
    two-phase shape as the reference's two-level read
    (PostgresqlStorage.java:446-467).

    balance=True re-derives shard boundaries from the corpus token total the
    refinement stats already carry (zero extra scans): boundary k at offset
    k*total/n_shards in exact integer math, so EVERY shard — the last one
    included — lands within one document of total/n_shards, instead of the
    literal-budget floor leaving a runt last shard of total % budget tokens
    (up to -100% off target). Off by default because the emitted shard_id is
    a pinned deterministic contract (the DuckDB oracle twin embeds the
    literal budget)."""
    if n_chunks is None:
        n_chunks = df.sparkSession.sparkContext.defaultParallelism
    bounds, stats = _refined_bounds(df, order_col, n_chunks)
    if not bounds:
        if balance:
            # Same EXACT integer formula as the chunked path below
            # (shard_id = start*n_shards div total), not the rounded-budget
            # approximation: floor(start/effective_budget) can disagree with
            # the exact form (total=10, budget=3, start=7 → shard 2 vs 1),
            # and this branch fires on small corpora / n_chunks=1, so shard
            # assignment must not vary with parallelism.
            total = int(df.agg(F.sum("n_tokens")).collect()[0][0] or 0)
            n_shards = max(1, round(total / max(1, tokens_per_shard)))
            if 0 < total * n_shards < (1 << 62):
                w = Window.orderBy(order_col).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
                start = F.sum("n_tokens").over(w) - F.col("n_tokens")
                return (
                    df.withColumn("_sxn", (start * F.lit(n_shards)).cast("long"))
                    .withColumn("shard_id", F.expr(f"cast(_sxn div {total} as int)"))
                    .drop("_sxn")
                )
            tokens_per_shard = effective_shard_budget(total, tokens_per_shard)
        return plan_shards_single(df, tokens_per_shard, order_col)
    chunked = df.withColumn("_chunk", _chunk_expr(order_col, bounds))

    totals = {c: tot for c, (tot, _n) in stats.items()}
    balance_exact = None
    if balance:
        # shard sizing rides the refinement's existing aggregate — the stats
        # ARE the corpus total, so the hint costs nothing at plan time.
        # Exact form: boundary k sits at token offset k*total/n_shards, i.e.
        # shard_id = start_offset * n_shards div total — integer math, so the
        # remainder spreads one document at a time across shards instead of
        # accumulating into a runt last shard (a single rounded budget still
        # drifts by n_shards/2 tokens by the end of the corpus).
        total = sum(int(t or 0) for t in totals.values())
        n_shards = max(1, round(total / max(1, tokens_per_shard)))
        if 0 < total * n_shards < (1 << 62):  # start*n provably in long range
            balance_exact = (n_shards, total)
        else:
            tokens_per_shard = effective_shard_budget(total, tokens_per_shard)
    running, offsets = 0, {}
    for c in sorted(totals):
        offsets[c] = running
        running += int(totals[c] or 0)
    off_map = F.create_map(
        *[F.lit(x) for c in sorted(offsets) for x in (c, offsets[c])]
    )

    w = (
        Window.partitionBy("_chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumsum = off_map[F.col("_chunk")] + F.sum("n_tokens").over(w)
    start = cumsum - F.col("n_tokens")
    if balance_exact is not None:
        n_shards, total = balance_exact
        return (
            chunked.withColumn("_sxn", (start * F.lit(n_shards)).cast("long"))
            .withColumn("shard_id", F.expr(f"cast(_sxn div {total} as int)"))
            .drop("_sxn", "_chunk")
        )
    return chunked.withColumn(
        "shard_id", F.floor(start / F.lit(tokens_per_shard)).cast("int")
    ).drop("_chunk")


def build_training_dataset(
    transcripts: DataFrame,
    tokens_per_shard: int = 100_000,
    min_quality: float = 0.2,
) -> DataFrame:
    """Full pipeline: pack -> score/filter -> exact-dedup -> shard plan."""
    packed = pack_conversations(transcripts)
    good = score_and_filter(packed, min_quality=min_quality)
    uniq = drop_exact_duplicates(good)
    return plan_shards(uniq, tokens_per_shard)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic top-k rows per group — the corpus-mixing primitive
    (per-language / per-source quality quotas in a training mix).

    Declarative on purpose: `row_number() <= k` over a window is recognized by
    Spark's WindowGroupLimit optimization (Spark 3.5+ RankLimit pushdown), so
    each task keeps at most k rows per group BEFORE the window shuffle and
    sort — the two-phase partial-top-k plan you'd otherwise hand-build, for
    free, and it survives a dominant-group skew (each map task contributes at
    most k rows of the dominant group to the final sort). Plan shape is
    pinned in tests/test_pipeline.py."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= F.lit(int(k))
    )


def quality_mix(
    docs: DataFrame,
    quota: int,
    strata_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-weighted stratified selection: the top `quota` documents per
    stratum (language, source, ...) by quality score, ties broken by id —
    deterministic, so a re-run of the mix over the same corpus produces the
    same dataset (reproducible-training requirement)."""
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    return top_k_per_group(
        scored,
        [strata_col],
        [F.desc("quality"), F.col(id_col)],
        quota,
        rank_col="mix_rank",
    )
