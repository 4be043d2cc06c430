"""Optimistic-concurrency commits: concurrent writers race on the manifest CAS;
the loser retries and both batches land exactly once (the reference's
single-flight advisory lock / optimistic registry versioning,
PostgresqlStorage.java:503-505, PostgresNodeGroup.java:33-41)."""

from __future__ import annotations

import threading

from aqueduct_core_spark.lake.merge import merge_change_batch
from aqueduct_core_spark.lake.table import CommitConflict, LakeTable, Snapshot
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def test_concurrent_writers_both_commit(spark, tmp_table_dir):
    table = LakeTable.create(
        spark, tmp_table_dir, TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
        n_buckets=4, properties={"merge_mode": "mor"},
    )
    b1 = events_df(spark, [ev(i, conv=f"a{i}", turn=0) for i in range(1, 21)])
    b2 = events_df(spark, [ev(100 + i, conv=f"b{i}", turn=0) for i in range(1, 21)])

    errs = []

    def run(df, writer):
        try:
            merge_change_batch(table, df, batch_id=0, writer_id=writer)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=(b1, "w1"))
    t2 = threading.Thread(target=run, args=(b2, "w2"))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    snap = table.current()
    assert snap.txn.get("w1") == 0 and snap.txn.get("w2") == 0
    assert read_transcripts(table).count() == 40  # both batches, no loss


def test_manifest_cas_rejects_duplicate_version(spark, tmp_table_dir):
    table = LakeTable.create(
        spark, tmp_table_dir, TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id", n_buckets=2
    )
    snap = table.current()
    nxt = Snapshot(
        version=snap.version + 1, current_schema_id=snap.current_schema_id,
        schemas=snap.schemas, n_buckets=snap.n_buckets, bucket_key=snap.bucket_key,
        files=snap.files, txn=snap.txn, properties=snap.properties,
        parent=snap.version, committed_at=0.0,
    )
    table.try_commit(nxt)
    try:
        table.try_commit(nxt)
        raised = False
    except CommitConflict:
        raised = True
    assert raised


def test_losing_commit_attempt_leaves_no_orphan_files(spark, tmp_table_dir):
    """A writer that loses the manifest CAS must reclaim its already-written
    data files — orphans referenced by no manifest would leak forever (even
    expire_snapshots cannot find them)."""
    import os

    from aqueduct_core_spark.lake.table import BUCKET_COL, DATA_DIR, bucket_expr

    table = LakeTable.create(
        spark, tmp_table_dir, TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
        n_buckets=4, properties={"merge_mode": "mor"},
    )
    snap = table.current()
    from aqueduct_core_spark.lake.merge import normalize_events

    df = normalize_events(
        events_df(spark, [ev(i, conv=f"c{i}", turn=0) for i in range(1, 11)]),
        snap.schema(),
    ).withColumn(BUCKET_COL, bucket_expr(snap.bucket_key, snap.n_buckets))
    # simulate the losing side: files written, then the CAS fails
    losing = table.write_files(df, snap, kind="delta")
    assert all(os.path.exists(e["path"]) for e in losing)
    table.discard_files(losing)
    assert not any(os.path.exists(e["path"]) for e in losing)
    # the whole commit dir is gone, not just the parquet files
    data_root = os.path.join(tmp_table_dir, DATA_DIR)
    assert all(
        os.path.basename(os.path.dirname(os.path.dirname(e["path"]))) not in os.listdir(data_root)
        for e in losing
    )
    # end-to-end: two racing merges still leave only manifest-referenced files
    b1 = events_df(spark, [ev(50 + i, conv=f"x{i}", turn=0) for i in range(1, 6)])
    b2 = events_df(spark, [ev(80 + i, conv=f"y{i}", turn=0) for i in range(1, 6)])
    t1 = threading.Thread(target=merge_change_batch, args=(table, b1, 0, "wa"))
    t2 = threading.Thread(target=merge_change_batch, args=(table, b2, 0, "wb"))
    t1.start(); t2.start(); t1.join(); t2.join()
    live = {f["path"] for f in table.current().files}
    on_disk = set()
    for dirpath, _dn, fns in os.walk(data_root):
        for fn in fns:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.join(dirpath, fn))
    assert on_disk == live
