"""Arrow-vectorized payload transform path (the mandated pandas-UDF surface)."""

from __future__ import annotations

from aqueduct_core_spark.functions.transforms import normalize_payload
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def test_normalize_payload_vectorized(spark):
    batch = events_df(
        spark,
        [
            ev(1, conv="A", turn=0, text="  hello\t\tworld \n x  "),
            ev(2, conv="B", turn=0, text="mail me at bob@example.com ok"),
            ev(3, "D", conv="C", turn=0),  # tombstone text NULL passes through
        ],
    )
    out = {r["change_lsn"]: r["text"] for r in normalize_payload(batch).collect()}
    assert out[1] == "hello  world  x".replace("  ", " ")
    assert out[2] == "mail me at <email> ok"
    assert out[3] is None


def test_engine_applies_transform_before_merge(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    events_df(
        spark, [ev(1, conv="A", turn=0, text="  spaced   out\ttext ")]
    ).write.parquet(feed_dir)
    eng = IngestEngine(
        spark,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        n_buckets=4,
        transform=normalize_payload,
    )
    eng.run(feed_dir)
    rows = read_transcripts(LakeTable(spark, eng.table_root)).collect()
    assert rows[0]["text"] == "spaced out text"
