"""Hot-conversation skew: one conversation owning most of the feed must not
break correctness, and the salted pre-collapse path must agree with the
default (map-side-combine) path."""

from __future__ import annotations

from aqueduct_core_spark.feedgen import generate_change_feed
from aqueduct_core_spark.lake.merge import merge_change_batch
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def test_single_hot_key_duplicate_storm(spark, tmp_path):
    # thousands of versions of ONE (conv_id, turn_idx) in one batch — the case
    # the explicit salt pre-collapse exists for
    storm = [ev(i, "U", conv="hot", turn=0, text=f"v{i}", t=i) for i in range(1, 2001)]
    tail = [ev(3000 + i, conv=f"c{i}", turn=0) for i in range(5)]
    events = storm + tail

    t_plain = LakeTable.create(spark, str(tmp_path / "p"), TRANSCRIPT_PHYSICAL_SCHEMA,
                               bucket_key="conv_id", n_buckets=4)
    t_salted = LakeTable.create(spark, str(tmp_path / "s"), TRANSCRIPT_PHYSICAL_SCHEMA,
                                bucket_key="conv_id", n_buckets=4)
    merge_change_batch(t_plain, events_df(spark, events), batch_id=0, salt=0)
    merge_change_batch(t_salted, events_df(spark, events), batch_id=0, salt=16)

    want = [(r["conv_id"], r["turn_idx"], r["text"]) for r in replay(events)]
    for t in (t_plain, t_salted):
        got = [(r["conv_id"], r["turn_idx"], r["text"])
               for r in read_transcripts(t).orderBy("conv_id", "turn_idx").collect()]
        assert got == want
    assert want[-1] == ("hot", 0, "v2000")


def test_skewed_feed_matches_oracle(spark, tmp_path):
    # generator-level skew: hot conversations + power law, through the merge
    feed = generate_change_feed(spark, 8000, 50, 6, seed=13, skew=2.0,
                                n_hot=2, p_hot=0.4, ts_jitter_s=20)
    events = [e.asDict() for e in feed.collect()]
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA,
                         bucket_key="conv_id", n_buckets=8,
                         properties={"merge_mode": "mor"})
    for i in range(4):
        merge_change_batch(t, feed.filter(
            (feed.change_lsn > i * 2000) & (feed.change_lsn <= (i + 1) * 2000)
        ), batch_id=i)
    got = [(r["conv_id"], r["turn_idx"], r["text"])
           for r in read_transcripts(t).orderBy("conv_id", "turn_idx").collect()]
    want = [(r["conv_id"], r["turn_idx"], r["text"]) for r in replay(events)]
    assert got == want
