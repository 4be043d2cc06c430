"""Log-level CDC operators over an ordered change-event DataFrame.

Each function mirrors one reference operator (SURVEY.md §2 inventory) and is
generic over column names so it applies both to the engine's change feed
(conv_id/turn_idx/change_lsn/op) and to any (key, type, offset)-shaped log.

All operators are single declarative plans — Catalyst handles pushdown/pruning;
the only shuffles are the per-key aggregations, which use partial (map-side)
aggregation automatically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KEYS = ("conv_id", "turn_idx")


def _delete_col(df: DataFrame, is_delete: Column | None) -> Column:
    # default tombstone predicate: op = 'D'  (reference: data IS NULL)
    return is_delete if is_delete is not None else (F.col("op") == F.lit("D"))


# --------------------------------------------------------------------- reads
def read_page(
    df: DataFrame,
    start_lsn: int,
    end_lsn: int | None = None,
    types: Sequence[str] | None = None,
    limit: int | None = None,
    max_batch_bytes: int | None = None,
    lsn: str = "change_lsn",
    type_col: str = "entity",
    size_col: str = "event_size",
) -> DataFrame:
    """One pipe read page: offset-range + type filter + order + limit + running
    byte cap (reference S3/F1/F2/O1/O2/W1: SQLiteQueries.java:77-99 getReadEvent;
    the byte cap is SUM(event_size) OVER (ORDER BY msg_offset) < maxBatchSize,
    PostgresqlStorage.java:438-444).

    end_lsn is the visibility watermark: reads never pass the published global
    latest offset (PostgresqlStorage.java:129-131, 450-452).

    Scale note: a page is BY DEFINITION a sequential LSN prefix, so the
    byte-cap window is a global ORDER BY — executed over at most `limit` rows
    (or the lsn range) thanks to the preceding limit/range filters. Always
    bound a byte-capped read with `limit` and/or `end_lsn`; an unbounded
    max_batch_bytes scan would funnel the whole log through one task (raised
    below rather than silently planned).
    """
    if max_batch_bytes is not None and limit is None and end_lsn is None:
        raise ValueError(
            "max_batch_bytes needs a bound (limit or end_lsn): the running-"
            "byte window over an unbounded log is a single-task global sort"
        )
    out = df.filter(F.col(lsn) >= start_lsn)
    if end_lsn is not None:
        out = out.filter(F.col(lsn) <= end_lsn)
    if types:
        out = out.filter(F.col(type_col).isin(list(types)))
    out = out.orderBy(lsn)
    if limit is not None:
        out = out.limit(limit)
    if max_batch_bytes is not None:
        w = Window.orderBy(lsn).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = (
            out.withColumn("_running", F.sum(size_col).over(w))
            .filter(F.col("_running") < max_batch_bytes)
            .drop("_running")
        )
    return out


def routing_filter(
    df: DataFrame, clusters: Sequence[int], routing_col: str = "routing_id"
) -> DataFrame:
    """Cluster/routing partition filter (reference F3/J1: the unnest+lateral
    per-cluster scan, PostgresqlStorage.java:446-467). The small side is a
    literal set, so this is an `isin` partition-pruning predicate rather than a
    join — pushed all the way into the scan."""
    return df.filter(F.col(routing_col).isin([int(c) for c in clusters]))


# --------------------------------------------------------------- aggregations
def lww_latest(
    df: DataFrame,
    key_cols: Sequence[str] = DEFAULT_KEYS,
    order_cols: Sequence[str] = ("ts", "change_lsn"),
) -> DataFrame:
    """One winner row per key by the LWW ordering (reference A1/W2:
    max(msg_offset) per (msg_key, type), SQLiteQueries.java:51-52). groupBy +
    max_by keeps partial aggregation (a window row_number would not)."""
    row = F.struct(*[F.col(c) for c in df.columns]).alias("_r")
    ordk = F.struct(*[F.col(c) for c in order_cols])
    return df.groupBy(*key_cols).agg(F.max_by(row, ordk).alias("_r")).select("_r.*")


def global_latest_offset(df: DataFrame, lsn: str = "change_lsn") -> int:
    """Reference A2 (GlobalLatestOffsetCache.java:16-36)."""
    v = df.agg(F.max(lsn).alias("m")).collect()[0]["m"]
    return int(v) if v is not None else 0


def max_offset_for_types(
    df: DataFrame, types: Sequence[str], lsn: str = "change_lsn", type_col: str = "entity"
) -> int:
    """Reference A3 (SQLiteQueries.java:114-124 maxOffsetForConsumersQuery)."""
    v = (
        df.filter(F.col(type_col).isin(list(types)))
        .agg(F.max(lsn).alias("m"))
        .collect()[0]["m"]
    )
    return int(v) if v is not None else 0


def max_offset_before(df: DataFrame, threshold_ts, lsn: str = "change_lsn", ts: str = "ts") -> int:
    """Reference A4: max offset at/below a time threshold (CHOOSE_MAX_OFFSET,
    SQLiteQueries.java:66-67; hour-truncated caller SQLiteStorage.java:496-505)."""
    v = df.filter(F.col(ts) <= threshold_ts).agg(F.max(lsn).alias("m")).collect()[0]["m"]
    return int(v) if v is not None else 0


def count_by_type(df: DataFrame, type_col: str = "entity") -> DataFrame:
    """Reference A5 (PostgresqlStorage.java:507-509)."""
    return df.groupBy(type_col).agg(F.count(F.lit(1)).alias("n"))


def consistency_sum(
    df: DataFrame,
    threshold_lsn: int,
    key_cols: Sequence[str] = DEFAULT_KEYS,
    lsn: str = "change_lsn",
    is_delete: Column | None = None,
) -> int:
    """Offset-consistency checksum (reference A6, SQLiteQueries.java:57-64):
    per key, winner = max lsn among rows with lsn <= threshold; winners that are
    tombstones are excluded; return the sum of the rest. Single groupBy plan."""
    d = _delete_col(df, is_delete)
    per_key = (
        df.filter(F.col(lsn) <= threshold_lsn)
        .groupBy(*key_cols)
        .agg(F.max(lsn).alias("_max_lsn"), F.max_by(d, F.col(lsn)).alias("_winner_deleted"))
    )
    v = (
        per_key.filter(~F.col("_winner_deleted"))
        .agg(F.sum("_max_lsn").alias("s"))
        .collect()[0]["s"]
    )
    return int(v) if v is not None else 0


# ---------------------------------------------------------------- compaction
def compact_log(
    df: DataFrame,
    compact_threshold_ts,
    deletion_threshold_ts=None,
    compact_deletions: bool = True,
    key_cols: Sequence[str] = DEFAULT_KEYS,
    lsn: str = "change_lsn",
    ts: str = "ts",
    is_delete: Column | None = None,
) -> DataFrame:
    """Log compaction, exactly the reference's two statements
    (SQLiteQueries.java:51-55, executed by SQLiteStorage.compactUpTo):

      1. COMPACT: drop rows with ts <= compact_threshold that are not the
         per-key max-lsn among rows with ts <= compact_threshold.
      2. COMPACT_DELETIONS: additionally drop tombstones with
         ts <= deletion_threshold (tombstones newer than that stay visible so
         late readers still observe the delete — the 30-day retention rule).

    Verified against the reference's golden 25-message case
    (SQLiteStorageIntegrationSpec.groovy:835-895) in tests/test_cdc_log_ops.py.

    Implemented as one windowed plan over the key partition: conditional max
    avoids a self-join (the reference's NOT IN subquery shape).
    """
    d = _delete_col(df, is_delete)
    w = Window.partitionBy(*[F.col(k) for k in key_cols])
    in_window = F.col(ts) <= F.lit(compact_threshold_ts)
    max_in_window = F.max(F.when(in_window, F.col(lsn))).over(w)
    out = df.withColumn("_max_in_window", max_in_window).filter(
        ~in_window | (F.col(lsn) == F.col("_max_in_window"))
    )
    if compact_deletions and deletion_threshold_ts is not None:
        out = out.filter(~(d & (F.col(ts) <= F.lit(deletion_threshold_ts))))
    return out.drop("_max_in_window")


def mark_and_sweep_deletions(
    df: DataFrame,
    deletion_threshold_ts,
    now_ts,
    key_cols: Sequence[str] = DEFAULT_KEYS,
    lsn: str = "change_lsn",
    ts: str = "ts",
    is_delete: Column | None = None,
    cluster_col: str = "cluster_id",
    routing_col: str = "routing_id",
    ttl_col: str = "ttl",
) -> DataFrame:
    """Postgres-side deletion compaction, exactly the reference's two steps
    (PostgresqlStorage.java:469-488):

      1. MARK: for each (key, cluster) having an UNSTAMPED tombstone
         (time_to_live IS NULL in the subquery) with ts <= deletion_threshold
         AND cluster_id = routing_id (the routing guard — deletes relinked to
         another routing partition must NOT compact that partition's history,
         PostgresqlStorageIntegrationSpec.groovy:335-370), stamp ttl = now on
         EVERY row of that key/cluster with lsn <= the latest such tombstone —
         the UPDATE has no ttl-is-null condition, so a pre-stamped future TTL
         is overwritten and the row dies this run.
      2. SWEEP: drop rows whose ttl <= now (pre-stamped TTLs from earlier runs
         expire on their own schedule).

    Returns the surviving rows (ttl column preserved where already set)."""
    d = _delete_col(df, is_delete)
    has_ttl = ttl_col in df.columns
    ttl = F.col(ttl_col) if has_ttl else F.lit(None).cast("timestamp")

    last_del = (
        df.filter(d & (F.col(ts) <= F.lit(deletion_threshold_ts))
                  & ttl.isNull()  # only unstamped tombstones seed a mark pass
                  & (F.col(cluster_col) == F.col(routing_col)))
        .groupBy(*[F.col(k).alias(f"_k_{k}") for k in key_cols],
                 F.col(cluster_col).alias("_k_cluster"))
        .agg(F.max(lsn).alias("_last_del"))
    )
    cond = (F.col(cluster_col) == F.col("_k_cluster"))
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_k_{k}"))
    # no forced broadcast: last_del holds every key with an aged tombstone in
    # the retention window — unbounded between compactions at 10^10 events.
    # AQE picks broadcast when the runtime size allows, shuffle join otherwise.
    joined = df.join(last_del, cond, "left")
    # no ttl.isNull() here: the reference UPDATE overwrites existing TTLs
    marked = F.col("_last_del").isNotNull() & (F.col(lsn) <= F.col("_last_del"))
    expired = ttl.isNotNull() & (ttl <= F.lit(now_ts))
    return joined.filter(~marked & ~expired).select(*[F.col(c) for c in df.columns])


def latest_deletes(
    df: DataFrame,
    deletion_threshold_ts,
    key_cols: Sequence[str] = DEFAULT_KEYS,
    lsn: str = "change_lsn",
    ts: str = "ts",
    is_delete: Column | None = None,
) -> DataFrame:
    """Per-key latest tombstone at/below the threshold — the inner subquery of
    the Postgres deletion-marking self-join (reference J3,
    PostgresqlStorage.java:473-488). Joined back to the log, every row with
    lsn <= last_delete_lsn gets its TTL stamped."""
    d = _delete_col(df, is_delete)
    return (
        df.filter(d & (F.col(ts) <= F.lit(deletion_threshold_ts)))
        .groupBy(*key_cols)
        .agg(F.max(lsn).alias("last_delete_lsn"))
    )
