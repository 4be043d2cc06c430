"""Postgres-side deletion compaction goldens (mark TTL + sweep + routing guard),
ported from PostgresqlStorageIntegrationSpec.groovy:284-391. Dates are fixed
relative to now = 2000-12-20 (spec uses LocalDateTime.now() offsets)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from aqueduct_core_spark.operators.cdc_log import mark_and_sweep_deletions

NOW = datetime(2000, 12, 20, 12, 0, 0)


def days_ago(n):
    return NOW - timedelta(days=n)


SCHEMA = ("change_lsn long, conv_id string, cluster_id long, routing_id long, "
          "ts timestamp, op string, ttl timestamp")


def row(lsn, key, cluster, created, deleted=False, routing=None, ttl=None):
    return (lsn, key, cluster, routing if routing is not None else cluster,
            created, "D" if deleted else "I", ttl)


def survivors(spark, rows, threshold_days):
    df = spark.createDataFrame(rows, SCHEMA)
    out = mark_and_sweep_deletions(
        df, deletion_threshold_ts=days_ago(threshold_days), now_ts=NOW,
        key_cols=["conv_id"],
    )
    return [r["change_lsn"] for r in out.orderBy("change_lsn").collect()]


def test_deletions_older_than_threshold_compacted(spark):
    # spec :284-304 -> only offset 4 remains
    rows = [
        row(1, "A", 1, days_ago(7), deleted=True),
        row(2, "B", 1, days_ago(7), deleted=True, ttl=days_ago(0)),  # pre-stamped, expired
        row(3, "B", 1, days_ago(6), deleted=True),
        row(4, "C", 1, days_ago(1), deleted=True),
    ]
    assert survivors(spark, rows, threshold_days=5) == [4]


def test_deletes_remove_prior_history_with_no_ttl(spark):
    # spec :306-333 -> [5, 6, 7, 8, 9, 10]
    rows = [
        row(1, "A", 1, days_ago(7)),
        row(2, "A", 1, days_ago(7), deleted=True),
        row(3, "B", 1, days_ago(7)),
        row(4, "B", 1, days_ago(8), deleted=True),
        row(5, "B", 1, days_ago(8)),
        row(6, "C", 1, days_ago(8), deleted=True, ttl=NOW + timedelta(days=2)),  # future ttl
        # different routing id -> the guard protects them
        row(7, "D", 1, days_ago(8), routing=2),
        row(8, "D", 1, days_ago(8), deleted=True, routing=2),
        row(9, "D", 1, days_ago(8), routing=2),
        row(10, "E", 1, days_ago(8), routing=2),
    ]
    assert survivors(spark, rows, threshold_days=5) == [5, 6, 7, 8, 9, 10]


def test_fresh_tombstone_overwrites_prestamped_future_ttl(spark):
    # PostgresqlStorage.java:473-488: the UPDATE carries no ttl-is-null guard,
    # so a row pre-stamped with a FUTURE ttl still dies when a fresh unstamped
    # tombstone covers it this run.
    rows = [
        row(1, "A", 1, days_ago(9)),
        row(2, "A", 1, days_ago(9), ttl=NOW + timedelta(days=2)),
        row(3, "A", 1, days_ago(8), deleted=True),
    ]
    assert survivors(spark, rows, threshold_days=5) == []


def test_stamped_tombstone_does_not_seed_marking(spark):
    # the subquery filters time_to_live IS NULL: an already-stamped tombstone
    # must not mark its key's history again.
    rows = [
        row(1, "B", 1, days_ago(9)),
        row(2, "B", 1, days_ago(8), deleted=True, ttl=NOW + timedelta(days=2)),
    ]
    assert survivors(spark, rows, threshold_days=5) == [1, 2]


def test_routing_guard_blocks_foreign_deletes(spark):
    # spec :335-370 -> [2, 3, 4] after both compaction passes
    rows = [
        row(1, "A", 1, days_ago(11), deleted=True),
        row(2, "A", 1, days_ago(11)),
        row(3, "A", 1, days_ago(6), deleted=True, routing=2),
        row(4, "A", 1, days_ago(6), routing=2),
    ]
    first = survivors(spark, rows, threshold_days=10)
    assert first == [2, 3, 4]
    # compaction window moves: delete 3 is now old enough BUT routing != cluster
    kept = [r for r in rows if r[0] in first]
    assert survivors(spark, kept, threshold_days=5) == [2, 3, 4]
