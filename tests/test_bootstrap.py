"""Bootstrap state-machine matrix (reference BootstrapType.java /
BootstrapService.java:37-87 + SelfRegistrationTask.java:61-66): each variant
must leave exactly the right state behind and replay to oracle equality.

Mapping under test: provider <-> lake table, pipe <-> checkpoint + txn
watermark, controller <-> pipe_state property.
"""

from __future__ import annotations

import os

import pytest

from aqueduct_core_spark.feedgen import generate_change_feed, write_segments
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bfeed"))
    feed = generate_change_feed(
        spark, n_events=3000, n_convs=80, turns_per_conv=8, seed=5, dup_frac=0.02
    )
    write_segments(feed, d, n_segments=4)
    return d


def view(spark, root):
    t = LakeTable(spark, root)
    return [
        tuple(r) for r in read_transcripts(t).orderBy("conv_id", "turn_idx").collect()
    ]


def oracle_view(spark, *feed_dirs):
    events = []
    for d in feed_dirs:
        events.extend(e.asDict() for e in spark.read.parquet(d).collect())
    events.sort(key=lambda e: e["change_lsn"])
    return [tuple(r.values()) for r in replay(events)]


def mk(spark, tmp_path, **kw):
    return IngestEngine(
        spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), n_buckets=8, **kw
    )


def test_pipe_and_provider_full_replay(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=2)
    eng.bootstrap("PIPE_AND_PROVIDER")
    assert view(spark, eng.table_root) == []  # table recreated empty
    assert not os.path.exists(eng.checkpoint_dir)
    eng2 = mk(spark, tmp_path)
    eng2.run(feed_dir, max_files_per_trigger=2)
    assert view(spark, eng2.table_root) == oracle_view(spark, feed_dir)


def test_provider_keeps_checkpoint(spark, tmp_path):
    """PROVIDER recreates the table but keeps source offsets: already-consumed
    events never land again; only NEW feed segments do."""
    from pyspark.sql import functions as F

    local_feed = str(tmp_path / "pfeed")
    feed = generate_change_feed(
        spark, n_events=2000, n_convs=50, turns_per_conv=8, seed=5, dup_frac=0.02
    )
    write_segments(feed, local_feed, n_segments=3)
    eng = mk(spark, tmp_path)
    eng.run(local_feed, max_files_per_trigger=2)
    eng.bootstrap("PROVIDER")
    assert view(spark, eng.table_root) == []
    assert os.path.exists(eng.checkpoint_dir)  # offsets preserved
    # re-run over the SAME feed: nothing new -> table stays empty
    eng2 = mk(spark, tmp_path)
    eng2.run(local_feed, max_files_per_trigger=2)
    assert view(spark, eng2.table_root) == []
    # new events arrive (fresh conv ids, higher LSNs) -> only they are applied
    extra = (
        generate_change_feed(spark, n_events=400, n_convs=10, turns_per_conv=6, seed=99)
        .withColumn("change_lsn", F.col("change_lsn") + F.lit(1_000_000))
        .withColumn("conv_id", F.concat(F.lit("x-"), F.col("conv_id")))
    )
    extra_dir = str(tmp_path / "extra")
    write_segments(extra, extra_dir, n_segments=1)
    for f in os.listdir(extra_dir):
        if f.endswith(".parquet"):
            os.rename(os.path.join(extra_dir, f), os.path.join(local_feed, "z_" + f))
    eng3 = mk(spark, tmp_path)
    eng3.run(local_feed, max_files_per_trigger=2)
    got = view(spark, eng3.table_root)
    assert len(got) > 0
    assert all(r[0].startswith("x-") for r in got)  # only the new events landed


def test_pipe_resets_offsets_keeps_table(spark, feed_dir, tmp_path):
    """PIPE wipes the checkpoint (and the writer's txn watermark) but keeps
    the table: the feed re-applies idempotently and converges to the oracle —
    batches must actually apply, not be skipped by the stale watermark."""
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=2)
    before = view(spark, eng.table_root)
    eng.bootstrap("PIPE")
    assert view(spark, eng.table_root) == before  # table untouched
    assert not os.path.exists(eng.checkpoint_dir)
    assert eng.pipe_state() == "OUT_OF_DATE"
    eng2 = mk(spark, tmp_path)
    eng2.run(feed_dir, max_files_per_trigger=2)
    assert eng2.metrics.batches_applied > 0  # replay really applied
    assert eng2.metrics.batches_skipped == 0
    assert view(spark, eng2.table_root) == oracle_view(spark, feed_dir)
    assert eng2.pipe_state() == "UP_TO_DATE"


def test_with_delay_variants_sleep_between_reset_and_restart(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=3)
    slept = []
    eng.bootstrap("PIPE_WITH_DELAY", delay_ms=5000, sleep_fn=slept.append)
    assert slept == [5.0]
    slept2 = []
    eng.bootstrap("PIPE_AND_PROVIDER_WITH_DELAY", delay_ms=2000, sleep_fn=slept2.append)
    assert slept2 == [2.0]
    assert view(spark, eng.table_root) == []


def test_corruption_triggers_auto_bootstrap(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=3)
    assert eng.validate_table()
    assert eng.auto_bootstrap_if_corrupt() is False  # healthy -> no reset
    # corrupt the newest manifest
    t = LakeTable(spark, eng.table_root)
    with open(t._manifest_path(t.current().version), "w") as f:
        f.write("{not json")
    assert not eng.validate_table()
    assert eng.auto_bootstrap_if_corrupt() is True
    eng2 = mk(spark, tmp_path)
    eng2.run(feed_dir, max_files_per_trigger=3)
    assert view(spark, eng2.table_root) == oracle_view(spark, feed_dir)


def test_missing_data_file_fails_validation(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=3)
    victim = LakeTable(spark, eng.table_root).current().files[0]["path"]
    os.remove(victim)
    assert not eng.validate_table()


def test_stale_node_auto_bootstraps(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=3)
    # registered recently -> nothing happens
    assert eng.bootstrap_if_stale(last_registration_time=990.0, threshold_s=100, now=1000.0) is False
    assert view(spark, eng.table_root) != []
    # stale beyond the deletions threshold -> full reset
    assert eng.bootstrap_if_stale(last_registration_time=0.0, threshold_s=100, now=1000.0) is True
    assert view(spark, eng.table_root) == []


def test_none_and_unknown(spark, feed_dir, tmp_path):
    eng = mk(spark, tmp_path)
    eng.run(feed_dir, max_files_per_trigger=3)
    before = view(spark, eng.table_root)
    eng.bootstrap("NONE")
    assert view(spark, eng.table_root) == before
    with pytest.raises(ValueError):
        eng.bootstrap("SOMETHING_ELSE")
