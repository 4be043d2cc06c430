"""Incremental tailing: a drained stream resumed from the same checkpoint picks
up only newly arrived segments (the reference's tail loop, poll-from-
LOCAL_LATEST_OFFSET+1, HttpPipeClient.java:36-63)."""

from __future__ import annotations

from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def test_new_segments_picked_up_incrementally(spark, tmp_path):
    feed = str(tmp_path / "feed")
    first = [ev(i, conv=f"c{i % 5}", turn=i % 3, t=i) for i in range(1, 41)]
    events_df(spark, first).coalesce(2).write.mode("append").parquet(feed)

    eng = IngestEngine(spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
                       n_buckets=4, merge_mode="mor")
    eng.run(feed, max_files_per_trigger=2)
    n1 = read_transcripts(LakeTable(spark, eng.table_root)).count()
    applied_first = eng.metrics.batches_applied
    assert applied_first >= 1 and n1 > 0

    # the log grows: updates + deletes over existing keys and brand-new convs
    second = (
        [ev(100 + i, "U", conv=f"c{i % 5}", turn=i % 3, t=100 + i) for i in range(10)]
        + [ev(150, "D", conv="c0", turn=0, t=200)]
        + [ev(151, conv="new", turn=0, t=201)]
    )
    events_df(spark, second).coalesce(1).write.mode("append").parquet(feed)

    eng2 = IngestEngine(spark, eng.table_root, eng.checkpoint_dir,
                        n_buckets=4, merge_mode="mor")
    eng2.run(feed, max_files_per_trigger=2)
    # only the new segment was processed (not a re-replay of everything)
    assert eng2.metrics.batches_applied + eng2.metrics.batches_skipped <= 2

    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_transcripts(LakeTable(spark, eng.table_root))
        .orderBy("conv_id", "turn_idx").collect()
    ]
    want = [(r["conv_id"], r["turn_idx"], r["text"]) for r in replay(first + second)]
    assert got == want


def test_json_feed_ingestion(spark, tmp_path):
    # the same engine over a JSON change log (heterogeneous producers)
    feed = str(tmp_path / "jfeed")
    events_df(spark, [ev(i, conv=f"j{i % 3}", turn=i % 2, t=i) for i in range(1, 21)]) \
        .coalesce(1).write.json(feed)
    eng = IngestEngine(spark, str(tmp_path / "jtbl"), str(tmp_path / "jckpt"),
                       n_buckets=4, merge_mode="mor")
    eng.run(feed, max_files_per_trigger=2, fmt="json")
    got = [(r["conv_id"], r["turn_idx"], r["text"])
           for r in read_transcripts(LakeTable(spark, eng.table_root))
           .orderBy("conv_id", "turn_idx").collect()]
    want = [(r["conv_id"], r["turn_idx"], r["text"])
            for r in replay([ev(i, conv=f"j{i % 3}", turn=i % 2, t=i) for i in range(1, 21)])]
    assert got == want
