"""Dead-letter quarantine: malformed change events (fields the LWW semantics
cannot order — NULL lsn/key/ts, unknown op) are diverted to a parquet
quarantine sink with a reason code instead of poisoning the merge, and the
applied state still equals the oracle over the clean events alone. The
reference rejects such writes per-message at the HTTP layer; a streaming lake
engine quarantines them."""

from __future__ import annotations

from pyspark.sql.types import StructField, StructType

from aqueduct_core_spark.lake.merge import split_malformed
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.schema import CHANGE_EVENT_SCHEMA
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df, ts

_NULLABLE = StructType(
    [StructField(f.name, f.dataType, True) for f in CHANGE_EVENT_SCHEMA.fields]
)

_BAD_ROWS = [
    # (row, expected reason)
    ((None, "I", "turn", "cX", 0, "user", "g1", None, ts(5), 0, 64), "null_lsn"),
    ((901, "X", "turn", "cX", 0, "user", "g2", None, ts(5), 0, 64), "bad_op"),
    ((902, "I", "turn", "", 0, "user", "g3", None, ts(5), 0, 64), "null_conv"),
    ((903, "I", "turn", "cX", None, "user", "g4", None, ts(5), 0, 64), "null_turn_idx"),
    ((904, "I", "turn", "cX", 0, "user", "g5", None, None, 0, 64), "null_ts"),
    # NULL op: three-valued logic (~NULL.isin(...) is NULL) must not wave it past
    ((905, None, "turn", "cX", 0, "user", "g6", None, ts(5), 0, 64), "bad_op"),
]


def test_split_malformed_reasons(spark):
    bad = spark.createDataFrame([r for r, _ in _BAD_ROWS], _NULLABLE)
    clean_events = [ev(i, conv=f"c{i % 3}", turn=0, t=i) for i in range(1, 6)]
    both = events_df(spark, clean_events).unionByName(bad)
    clean, quarantined = split_malformed(both)
    assert clean.count() == 5
    got = {r["text"]: r["_reason"] for r in quarantined.collect()}
    assert got == {f"g{i + 1}": reason for i, (_, reason) in enumerate(_BAD_ROWS)}
    # conversation-level events legitimately carry NULL turn_idx — not malformed
    conv = events_df(spark, [ev(99, "D", entity="conversation", conv="c1", turn=None)])
    c2, q2 = split_malformed(conv)
    assert c2.count() == 1 and q2.count() == 0


def test_engine_quarantines_and_applies_clean_side(spark, tmp_path):
    clean = [ev(i, conv=f"c{i % 4}", turn=i % 3, t=i) for i in range(1, 41)]
    feed_dir = str(tmp_path / "feed")
    events_df(spark, clean).repartition(4).write.parquet(feed_dir)
    spark.createDataFrame([r for r, _ in _BAD_ROWS], _NULLABLE).write.mode(
        "append"
    ).parquet(feed_dir)

    dlq = str(tmp_path / "dlq")
    eng = IngestEngine(
        spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4, merge_mode="mor", quarantine_dir=dlq,
    )
    eng.run(feed_dir, max_files_per_trigger=2)
    eng.close()

    assert eng.metrics.events_quarantined == len(_BAD_ROWS)
    q = spark.read.parquet(dlq)
    assert q.count() == len(_BAD_ROWS)
    assert {r["_reason"] for r in q.collect()} == {reason for _, reason in _BAD_ROWS}
    assert set(q.columns) >= set(CHANGE_EVENT_SCHEMA.fieldNames()) | {"_reason", "_batch_id"}

    expected = [
        (r["conv_id"], r["turn_idx"], r["text"]) for r in replay(clean)
    ]
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_transcripts(LakeTable(spark, eng.table_root))
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    assert got == expected


def test_quarantine_precedes_resume_and_entity_filters(spark, tmp_path):
    """The DLQ split runs BEFORE the entity/routing/min_lsn filters: a
    malformed event (NULL change_lsn, NULL entity) would be silently dropped
    by those three-valued-logic predicates (NULL > min_lsn is NULL) instead
    of landing in quarantine — the DLQ contract says it must land."""
    clean = [ev(i, conv=f"c{i % 3}", turn=i, t=i) for i in range(101, 111)]
    feed = events_df(spark, clean).unionByName(
        spark.createDataFrame([r for r, _ in _BAD_ROWS], _NULLABLE)
    )
    dlq = str(tmp_path / "dlq")
    eng = IngestEngine(
        spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        n_buckets=4, merge_mode="mor", quarantine_dir=dlq,
        min_lsn=100, entity_filter=["turn", "conversation"],
    )
    eng.ensure_table()
    eng.apply_batch(feed, 0)
    eng.close()
    # every malformed row quarantined — including the NULL-lsn one the
    # min_lsn filter would have silently eaten
    assert eng.metrics.events_quarantined == len(_BAD_ROWS)
    q = spark.read.parquet(dlq)
    assert {r["_reason"] for r in q.collect()} == {reason for _, reason in _BAD_ROWS}
    # and the clean side still respects the resume floor
    assert read_transcripts(LakeTable(spark, eng.table_root)).count() == len(clean)


def _jobs_in_group(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(tag))


def test_quarantine_costs_one_extra_job_only_when_dirty(spark, tmp_path):
    """Single-pass accounting: the malformed count rides an Observation on
    the scan the merge already runs, so a CLEAN batch pays zero extra jobs;
    the quarantine append is one extra job exactly when malformed rows exist.
    (Jobs submitted from the engine's lineage thread are outside the job
    group on both sides, so the comparison isolates the main-thread plan.)"""
    clean_df = events_df(
        spark, [ev(i, conv=f"c{i % 3}", turn=0, t=i) for i in range(1, 21)]
    )
    bad_df = spark.createDataFrame([r for r, _ in _BAD_ROWS], _NULLABLE)

    def engine(tag):
        e = IngestEngine(
            spark, str(tmp_path / f"t{tag}"), str(tmp_path / f"c{tag}"),
            n_buckets=4, merge_mode="mor", quarantine_dir=str(tmp_path / f"q{tag}"),
        )
        e.ensure_table()
        return e

    e_clean, e_dirty = engine("clean"), engine("dirty")
    n_clean = _jobs_in_group(spark, "dlq-clean", lambda: e_clean.apply_batch(clean_df, 0))
    n_dirty = _jobs_in_group(
        spark, "dlq-dirty", lambda: e_dirty.apply_batch(clean_df.unionByName(bad_df), 0)
    )
    e_clean.close()
    e_dirty.close()
    assert e_clean.metrics.events_quarantined == 0
    assert e_dirty.metrics.events_quarantined == len(_BAD_ROWS)
    assert n_dirty == n_clean + 1
