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
