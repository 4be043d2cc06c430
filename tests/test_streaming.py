"""Streaming ingest: checkpointed resume, exactly-once across crash points,
lineage monotonicity, routing/entity filters.

Reference behaviors: tail loop + atomic apply + bootstrap
(SQLiteStorage.java:134-171, BootstrapService.java:37-87,
SQLiteStorageIntegrationSpec.groovy:215-318).
"""

from __future__ import annotations

import pytest

from aqueduct_core_spark.feedgen import generate_change_feed, write_segments
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("feed"))
    feed = generate_change_feed(
        spark, n_events=6000, n_convs=120, turns_per_conv=10,
        seed=42, skew=1.3, n_hot=2, p_hot=0.08, ts_jitter_s=20, dup_frac=0.02,
    )
    write_segments(feed, d, n_segments=6)
    return d


def collect_view(spark, root):
    t = LakeTable(spark, root)
    return [
        tuple(r) for r in read_transcripts(t).orderBy("conv_id", "turn_idx").collect()
    ]


def oracle_view(spark, feed_dir, routing=None, entities=None):
    events = [e.asDict() for e in spark.read.parquet(feed_dir).collect()]
    if entities:
        events = [e for e in events if e["entity"] in entities]
    if routing:
        events = [e for e in events if e["routing_id"] in routing]
    return [tuple(r.values()) for r in replay(events)]


def test_streaming_replay_matches_oracle(spark, feed_dir, tmp_path):
    eng = IngestEngine(spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), n_buckets=8)
    eng.run(feed_dir, max_files_per_trigger=2)
    assert collect_view(spark, eng.table_root) == oracle_view(spark, feed_dir)
    assert eng.pipe_state() == "UP_TO_DATE"
    assert eng.metrics.batches_applied >= 3  # genuinely micro-batched


def test_resume_from_checkpoint_after_crash_before_commit(spark, feed_dir, tmp_path):
    root, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    eng = IngestEngine(spark, root, ckpt, n_buckets=8, fail_after_batches=2,
                       fail_point="before_commit")
    with pytest.raises(Exception):
        eng.run(feed_dir, max_files_per_trigger=1)
    # restart from the same checkpoint, no crash injection
    eng2 = IngestEngine(spark, root, ckpt, n_buckets=8)
    eng2.run(feed_dir, max_files_per_trigger=1)
    assert collect_view(spark, root) == oracle_view(spark, feed_dir)


def test_crash_between_commit_and_checkpoint_is_exactly_once(spark, feed_dir, tmp_path):
    # the hard case: lake commit succeeded, Spark checkpoint did not -> restart
    # replays the same batch_id and the merge MUST skip it (no double apply)
    root, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    eng = IngestEngine(spark, root, ckpt, n_buckets=8, fail_after_batches=2,
                       fail_point="after_commit")
    with pytest.raises(Exception):
        eng.run(feed_dir, max_files_per_trigger=1)
    committed_batch = LakeTable(spark, root).current().txn.get(eng.writer_id)
    eng2 = IngestEngine(spark, root, ckpt, n_buckets=8)
    eng2.run(feed_dir, max_files_per_trigger=1)
    assert eng2.metrics.batches_skipped >= 1  # the replayed batch was skipped
    assert collect_view(spark, root) == oracle_view(spark, feed_dir)
    assert committed_batch is not None


def test_lineage_watermarks_monotone_and_complete(spark, feed_dir, tmp_path):
    eng = IngestEngine(spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), n_buckets=8)
    eng.run(feed_dir, max_files_per_trigger=2)
    lineage = {r["partition_id"]: r["high_watermark_lsn"] for r in eng.lineage().collect()}
    feed = spark.read.parquet(feed_dir)
    expected = {
        r["routing_id"]: r["hw"]
        for r in feed.groupBy("routing_id").agg({"change_lsn": "max"})
        .withColumnRenamed("max(change_lsn)", "hw").collect()
    }
    assert lineage == {int(k): int(v) for k, v in expected.items()}


def test_routing_and_entity_filters(spark, feed_dir, tmp_path):
    # an edge node subscribing to a cluster subset / entity subset
    routing = [0, 3, 5]
    eng = IngestEngine(
        spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), n_buckets=8,
        routing_filter=routing, entity_filter=["turn", "conversation"],
    )
    eng.run(feed_dir, max_files_per_trigger=3)
    assert collect_view(spark, eng.table_root) == oracle_view(
        spark, feed_dir, routing=routing
    )


def test_bootstrap_resets_and_replays(spark, feed_dir, tmp_path):
    root, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    eng = IngestEngine(spark, root, ckpt, n_buckets=8)
    eng.run(feed_dir, max_files_per_trigger=3)
    before = collect_view(spark, root)
    eng.bootstrap()  # full reset: checkpoint + table
    eng.run(feed_dir, max_files_per_trigger=3)
    assert collect_view(spark, root) == before == oracle_view(spark, feed_dir)
