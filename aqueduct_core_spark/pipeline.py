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


def plan_shards(df: DataFrame, tokens_per_shard: int, order_col: str = "conv_id") -> DataFrame:
    """Deterministic token-budgeted shard assignment: running token sum in a
    stable order, shard_id = floor((cumsum - n) / budget). Single window here;
    the 100 TB variant computes per-partition totals first and broadcasts
    prefix offsets (distributed prefix sum) to avoid the global window."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(tokens_per_shard)).cast(
            "int"
        ),
    )


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
