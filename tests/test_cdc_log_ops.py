"""Golden log-operator cases ported verbatim from the reference's integration
specs (SQLiteStorageIntegrationSpec.groovy, PostgresqlStorageIntegrationSpec.groovy).

Mapping: msg_key -> conv_id, type -> entity, msg_offset -> change_lsn,
created_utc -> ts, `data IS NULL` tombstone -> op='D'. Key = (conv_id, entity),
mirroring the reference's (msg_key, type) compaction identity.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aqueduct_core_spark.operators import (
    compact_log,
    consistency_sum,
    count_by_type,
    global_latest_offset,
    latest_deletes,
    lww_latest,
    max_offset_before,
    max_offset_for_types,
    read_page,
    routing_filter,
)
from aqueduct_core_spark.schema import CHANGE_EVENT_SCHEMA

KEYS = ("conv_id", "entity")


def d(day: int, month: int = 12, hour: int = 10, minute: int = 0) -> datetime:
    return datetime(2000, month, day, hour, minute)


def msg(lsn, key, typ="type", created=None, deleted=False, size=64, routing=0):
    return {
        "change_lsn": lsn,
        "op": "D" if deleted else "I",
        "entity": typ,
        "conv_id": key,
        "turn_idx": 0,
        "role": "user",
        "text": None if deleted else f"data-{lsn}",
        "tool": None,
        "ts": created if created is not None else d(1),
        "routing_id": routing,
        "event_size": size,
    }


def log_df(spark, messages):
    return spark.createDataFrame(
        [tuple(m[f.name] for f in CHANGE_EVENT_SCHEMA.fields) for m in messages],
        CHANGE_EVENT_SCHEMA,
    )


def surviving_lsns(df):
    return [r["change_lsn"] for r in df.orderBy("change_lsn").collect()]


# ------------------------------------------------------------------ compaction
def test_compact_all_duplicates(spark):
    # SQLiteStorageIntegrationSpec.groovy:710-733 -> survivors [2, 3]
    df = log_df(spark, [msg(1, "A", created=d(1)), msg(2, "B", created=d(1)), msg(3, "A", created=d(1))])
    out = compact_log(df, d(2), key_cols=KEYS)
    assert surviving_lsns(out) == [2, 3]


def test_compact_same_key_different_types_kept(spark):
    # :734-756 -> both survive
    df = log_df(spark, [msg(1, "A", "type1", d(1)), msg(2, "A", "type2", d(1))])
    out = compact_log(df, d(2), key_cols=KEYS)
    assert surviving_lsns(out) == [1, 2]


def test_compact_respects_threshold(spark):
    # :757-780 -> duplicates newer than the threshold survive: [1,2,3,4]
    df = log_df(
        spark,
        [msg(1, "A", created=d(1)), msg(2, "A", created=d(3)), msg(3, "A", created=d(3)),
         msg(4, "B", created=d(3))],
    )
    out = compact_log(df, d(2), key_cols=KEYS)
    assert surviving_lsns(out) == [1, 2, 3, 4]


def test_compact_threshold_complex(spark):
    # :897-921 'All duplicate messages are compacted to a given offset, complex case'
    df = log_df(
        spark,
        [msg(1, "A", created=d(1)), msg(2, "B", created=d(1)), msg(3, "C", created=d(1)),
         msg(4, "C", created=d(1)), msg(5, "A", created=d(3)), msg(6, "B", created=d(3)),
         msg(7, "B", created=d(3)), msg(8, "D", created=d(3))],
    )
    out = compact_log(df, d(2), key_cols=KEYS)
    assert surviving_lsns(out) == [1, 2, 4, 5, 6, 7, 8]


def test_deletions_over_threshold_removed(spark):
    # :781-806 -> only lsn 4 survives
    df = log_df(
        spark,
        [msg(1, "A", "T", d(1), deleted=True), msg(2, "B", "T", d(2), deleted=True),
         msg(3, "C", "T", d(3), deleted=True), msg(4, "D", "T", d(4), deleted=True)],
    )
    out = compact_log(df, d(5), deletion_threshold_ts=d(3), key_cols=KEYS)
    assert surviving_lsns(out) == [4]


def test_deletions_not_compacted_when_flag_false(spark):
    # :807-834 -> survivors [1, 3, 4]
    df = log_df(
        spark,
        [msg(1, "A", "T", d(1), deleted=True), msg(2, "B", "T", d(2)),
         msg(3, "B", "T", d(3)), msg(4, "D", "T", d(5), deleted=True)],
    )
    out = compact_log(df, d(4), deletion_threshold_ts=d(3), compact_deletions=False, key_cols=KEYS)
    assert surviving_lsns(out) == [1, 3, 4]


def test_compaction_golden_25_message_case(spark):
    # :835-895 -> survivors [4,7,10,11,14,15,16,17,22,23,24,25]
    # every message shares one type ("some-type" via the spec's helpers); deletes
    # at offsets 2,4,6,7,9,10,11,13,16,19,21,23,25
    rows = [
        msg(1, "A", created=d(1)), msg(2, "A", created=d(2), deleted=True),
        msg(3, "B", created=d(4)), msg(4, "B", created=d(5), deleted=True),
        msg(5, "C", created=d(30, month=11)), msg(6, "C", created=d(1), deleted=True),
        msg(7, "C", created=d(4), deleted=True),
        msg(8, "D", created=d(29, month=11)), msg(9, "D", created=d(1), deleted=True),
        msg(10, "D", created=d(6), deleted=True), msg(11, "D", created=d(7), deleted=True),
        msg(12, "E", created=d(29, month=11)), msg(13, "E", created=d(1), deleted=True),
        msg(14, "E", created=d(2)),
        msg(15, "F", created=d(6)), msg(16, "F", created=d(7), deleted=True),
        msg(17, "F", created=d(8)),
        msg(18, "F", created=d(25, month=11)), msg(19, "F", created=d(29, month=11), deleted=True),
        msg(20, "F", created=d(1)), msg(21, "F", created=d(2), deleted=True),
        msg(22, "G", created=d(6)), msg(23, "G", created=d(7), deleted=True),
        msg(24, "G", created=d(8)), msg(25, "G", created=d(8), deleted=True),
    ]
    out = compact_log(log_df(spark, rows), d(5), deletion_threshold_ts=d(3), key_cols=KEYS)
    assert surviving_lsns(out) == [4, 7, 10, 11, 14, 15, 16, 17, 22, 23, 24, 25]


# -------------------------------------------------------------- consistency sum
def test_consistency_sum_empty(spark):
    # :1079-1083 empty database -> 0
    assert consistency_sum(log_df(spark, []), 10, key_cols=KEYS) == 0


def test_consistency_sum_same_key(spark):
    # :1085-1109 -> threshold offset 2, sum 2
    df = log_df(spark, [msg(1, "A", created=d(1, hour=9, minute=50)),
                        msg(2, "A", created=d(1, hour=9, minute=55)),
                        msg(3, "A", created=d(1, hour=10, minute=1))])
    thr = max_offset_before(df, d(1, hour=10))
    assert thr == 2
    assert consistency_sum(df, thr, key_cols=KEYS) == 2


def test_consistency_sum_multiple_keys(spark):
    # :1111-1144 -> threshold offset 6, sum 15
    t = lambda m: d(1, hour=9, minute=m)  # noqa: E731
    df = log_df(spark, [
        msg(1, "A", "type1", t(10)), msg(2, "B", "type1", t(20)), msg(3, "C", "type2", t(25)),
        msg(4, "C", "type2", t(30)), msg(5, "A", "type1", t(44)), msg(6, "B", "type1", d(1, hour=10)),
        msg(7, "B", "type1", d(1, hour=10, minute=1)), msg(8, "D", "type3", d(1, hour=10, minute=5)),
        msg(9, "A", "type1", d(1, hour=10, minute=43)),
    ])
    thr = max_offset_before(df, d(1, hour=10))
    assert thr == 6
    assert consistency_sum(df, thr, key_cols=KEYS) == 15


def test_consistency_sum_ignores_deleted(spark):
    # :1146-1170 -> 6
    t = lambda m: d(1, hour=9, minute=m)  # noqa: E731
    df = log_df(spark, [msg(1, "A", "type1", t(10)), msg(2, "B", "type1", t(20)),
                        msg(3, "A", "type1", t(44), deleted=True), msg(4, "C", "type2", t(50))])
    assert consistency_sum(df, 4, key_cols=KEYS) == 6


def test_consistency_sum_counts_key_with_nonlatest_delete(spark):
    # :1172-1198 -> 11
    t = lambda m: d(1, hour=9, minute=m)  # noqa: E731
    df = log_df(spark, [msg(1, "A", "type1", t(10)), msg(2, "B", "type1", t(20)),
                        msg(3, "A", "type1", t(44), deleted=True), msg(4, "C", "type2", t(50)),
                        msg(5, "A", "type1", t(55))])
    assert consistency_sum(df, 5, key_cols=KEYS) == 11


def test_consistency_sum_multiple_deletes(spark):
    # :1200-1226 -> 6
    t = lambda m: d(1, hour=9, minute=m)  # noqa: E731
    df = log_df(spark, [msg(1, "A", "type1", t(10)), msg(2, "B", "type1", t(20)),
                        msg(3, "A", "type1", t(44), deleted=True), msg(4, "C", "type2", t(45)),
                        msg(5, "A", "type1", t(50)), msg(6, "A", "type1", t(55), deleted=True)])
    assert consistency_sum(df, 6, key_cols=KEYS) == 6


# ------------------------------------------------------------------ reads/aggs
def test_max_offset_for_types_golden(spark):
    # :1228-1253 @Unroll table
    df = log_df(spark, [msg(i, f"k{i}", t) for i, t in
                        enumerate(["type1", "type1", "type2", "type2", "type1",
                                   "type1", "type1", "type3", "type1"], start=1)])
    assert max_offset_for_types(df, ["type1"]) == 9
    assert max_offset_for_types(df, ["type2"]) == 4
    assert max_offset_for_types(df, ["type3"]) == 8
    assert max_offset_for_types(df, ["type2", "type3"]) == 8
    assert max_offset_for_types(df, []) == 0
    assert global_latest_offset(df) == 9


def test_read_page_byte_cap(spark):
    # running SUM(event_size) OVER (ORDER BY offset) < maxBatchSize
    # (PostgresqlStorageIntegrationSpec.groovy:182-223)
    df = log_df(spark, [msg(i, f"k{i}", size=100) for i in range(1, 11)])
    out = read_page(df, start_lsn=1, limit=10, max_batch_bytes=350)
    assert surviving_lsns(out) == [1, 2, 3]  # 100,200,300 < 350; 400 capped
    out2 = read_page(df, start_lsn=4, limit=2, max_batch_bytes=10**6)
    assert surviving_lsns(out2) == [4, 5]


def test_read_page_visibility_bound_and_types(spark):
    df = log_df(spark, [msg(i, f"k{i}", "t1" if i % 2 else "t2") for i in range(1, 9)])
    out = read_page(df, start_lsn=2, end_lsn=6, types=["t1"])
    assert surviving_lsns(out) == [3, 5]


def test_routing_filter_golden(spark):
    # PostgresqlStorageIntegrationSpec.groovy:584-668: 6 events, clusters {1,3,4}
    # -> offsets [1, 4, 6]
    routing = {1: 1, 2: 2, 3: 5, 4: 3, 5: 2, 6: 4}
    df = log_df(spark, [msg(i, f"k{i}", routing=routing[i]) for i in range(1, 7)])
    out = routing_filter(df, [1, 3, 4])
    assert surviving_lsns(out) == [1, 4, 6]


def test_lww_latest_and_count_by_type(spark):
    df = log_df(spark, [msg(1, "A", created=d(1)), msg(2, "A", created=d(2)),
                        msg(3, "B", created=d(1))])
    winners = lww_latest(df, key_cols=KEYS)
    assert sorted(surviving_lsns(winners)) == [2, 3]
    counts = {r["entity"]: r["n"] for r in count_by_type(df).collect()}
    assert counts == {"type": 3}


def test_latest_deletes_marking(spark):
    # Postgres J3: per-key latest delete <= threshold; rows with lsn <= that get TTL
    df = log_df(spark, [msg(1, "A", created=d(1)), msg(2, "A", created=d(2), deleted=True),
                        msg(3, "A", created=d(3)), msg(4, "B", created=d(1), deleted=True)])
    ld = latest_deletes(df, d(2), key_cols=KEYS)
    rows = {(r["conv_id"]): r["last_delete_lsn"] for r in ld.collect()}
    assert rows == {"A": 2, "B": 4}
