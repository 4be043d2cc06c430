"""Deterministic, seeded change-event feed generator (Spark-native, no wall clock).

The analog of the reference's integration-spec data builders and JMH corpus
(pipe-storage-postgresql/src/jmh/.../ReadEventsQueryBenchmark.java:52-86 — 1M events,
100 clusters, 10 types), extended with the scenario knobs FIXTURES.md requires:
insert/update/delete mix, conversation-level events, hot-key skew, out-of-order
event time with in-order LSNs, and duplicate redelivery.

Every column is a pure function of (id, seed) via xxhash64 — identical output for
identical parameters on any cluster size, which is what makes the local[8] vs
local[32] scaling comparison and resume tests meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"

_WORDS = (
    "flow pipe merge offset batch stream window table turn reply plan tool call "
    "answer query check state apply delta shard"
).split()


def _u(seed: int, salt: int):
    """Deterministic uniform [0,1) from the row id."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(1_000_000))) / 1_000_000.0


def generate_change_feed(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    turns_per_conv: int = 20,
    seed: int = 42,
    p_conversation: float = 0.03,
    p_update: float = 0.25,
    p_delete: float = 0.05,
    skew: float = 1.0,
    n_hot: int = 0,
    p_hot: float = 0.0,
    ts_jitter_s: int = 0,
    avg_step_s: float = 1.0,
    dup_frac: float = 0.0,
    n_routing: int = 16,
) -> DataFrame:
    """Return an ordered change-event DataFrame (schema: CHANGE_EVENT_SCHEMA).

    skew > 1 concentrates events on low conv ids (power law); (n_hot, p_hot) adds
    a handful of pathological hot conversations on top (the north rule's skew
    mitigation target). ts is out-of-order within +-ts_jitter_s while change_lsn
    stays strictly increasing (late-data scenarios).
    """
    df = spark.range(n_events).withColumn("change_lsn", F.col("id") + 1)

    u_conv, u_hot, u_turn, u_ent, u_op, u_jit, u_role, u_dup = (
        _u(seed, i) for i in range(8)
    )

    conv_idx = F.floor(F.pow(u_conv, F.lit(skew)) * F.lit(n_convs)).cast("long")
    if n_hot > 0 and p_hot > 0:
        conv_idx = F.when(u_hot < F.lit(p_hot), (F.floor(u_conv * n_hot)).cast("long")).otherwise(
            conv_idx
        )
    df = df.withColumn("conv_id", F.format_string("conv-%08d", conv_idx))

    df = df.withColumn(
        "entity",
        F.when(u_ent < F.lit(p_conversation), F.lit("conversation")).otherwise(F.lit("turn")),
    )
    df = df.withColumn(
        "turn_idx",
        F.when(
            F.col("entity") == "turn", F.floor(u_turn * turns_per_conv).cast("int")
        ).otherwise(F.lit(None).cast("int")),
    )
    df = df.withColumn(
        "op",
        F.when(u_op < F.lit(p_delete), F.lit("D"))
        .when(u_op < F.lit(p_delete + p_update), F.lit("U"))
        .otherwise(F.lit("I")),
    )
    df = df.withColumn(
        "role",
        F.when(F.col("entity") == "conversation", F.lit("system")).otherwise(
            F.when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user")).otherwise(
                F.when(u_role < 0.15, F.lit("tool")).otherwise(F.lit("assistant"))
            )
        ),
    )
    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit(99)), F.lit(len(_WORDS))) + 1).cast("int"),
    )
    df = df.withColumn(
        "text",
        F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
            F.concat_ws(
                " ",
                word,
                F.col("conv_id"),
                F.col("entity"),
                F.col("change_lsn").cast("string"),
            )
        ),
    )
    df = df.withColumn(
        "tool",
        F.when(F.col("role") == "tool", F.concat(F.lit("tool-"), word)).otherwise(
            F.lit(None).cast("string")
        ),
    )
    jitter = (u_jit - 0.5) * (2 * ts_jitter_s)
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit(BASE_TS))
        + F.make_interval(secs=(F.col("id") * F.lit(avg_step_s) + jitter)),
    )
    df = df.withColumn("routing_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_routing)))
    df = df.withColumn(
        "event_size",
        F.length(
            F.to_json(F.struct("op", "entity", "conv_id", "turn_idx", "role", "text", "tool"))
        ).cast("int"),
    )
    df = df.select(
        "change_lsn", "op", "entity", "conv_id", "turn_idx", "role", "text", "tool",
        "ts", "routing_id", "event_size",
    )
    if dup_frac > 0:
        # redelivery: the same (lsn, payload) appears twice in the feed
        u = (
            F.pmod(F.xxhash64(F.col("change_lsn"), F.lit(seed), F.lit(7)), F.lit(1_000_000))
            / 1_000_000.0
        )
        dups = df.withColumn("_u", u).filter(F.col("_u") < dup_frac).drop("_u")
        df = df.unionAll(dups)
    return df


def write_segments(df: DataFrame, path: str, n_segments: int) -> None:
    """Persist the feed as LSN-range-ordered parquet segments (the replayable log).

    Range partitioning by change_lsn makes file k hold the k-th LSN range — the
    streaming source then tails segments in order, like the reference tails
    /pipe/{offset} pages (pipe-http-client/.../HttpPipeClient.java:36-63).
    """
    (
        df.repartitionByRange(n_segments, "change_lsn")
        .sortWithinPartitions("change_lsn")
        .write.mode("overwrite")
        .parquet(path)
    )
