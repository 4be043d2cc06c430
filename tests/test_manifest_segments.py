"""Two-level manifests: the snapshot JSON references immutable file-entry
SEGMENTS (Iceberg's manifest-list / manifest-file split), so commit metadata
cost is O(files changed), not O(files in table).

The reference's commit writes one SQLite row per message inside a single tx
(SQLiteStorage.java:134-171) — its metadata cost is already O(batch). A
single-level JSON manifest loses that property at lake scale (every commit
rewrites the full file list); these tests pin that the two-level form gets
it back, that metadata-only commits write zero segment bytes, and that
expiry reclaims unreferenced segments without breaking in-flight commits.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from aqueduct_core_spark.lake.fsio import get_fs
from aqueduct_core_spark.lake.merge import merge_change_batch, read_resolved
from aqueduct_core_spark.lake.table import (
    MANIFEST_DIR,
    SEGMENT_PREFIX,
    LakeTable,
    Snapshot,
)
from aqueduct_core_spark.maintenance import compact_table
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def _mk_table(spark, root, **props):
    return LakeTable.create(
        spark,
        root,
        TRANSCRIPT_PHYSICAL_SCHEMA,
        bucket_key="conv_id",
        n_buckets=4,
        properties={"merge_mode": "mor", **props},
    )


def _merge(table, spark, batch_id, lo, n=12):
    df = events_df(
        spark, [ev(lo + i, conv=f"c{lo + i}", turn=0) for i in range(n)]
    )
    merge_change_batch(table, df, batch_id=batch_id, writer_id="w")


def _doc(table, version) -> dict:
    return json.loads(get_fs().read_text(table._manifest_path(version)))


def _seg_files(root) -> set[str]:
    d = os.path.join(root, MANIFEST_DIR)
    return {f for f in get_fs().listdir(d) if f.startswith(SEGMENT_PREFIX)}


def test_data_commit_appends_one_segment_and_reuses_parent(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    _merge(table, spark, 0, 0)
    _merge(table, spark, 1, 100)
    _merge(table, spark, 2, 200)
    v = table.current().version
    head, parent = _doc(table, v), _doc(table, v - 1)
    head_paths = [s["path"] for s in head["segments"]]
    parent_paths = [s["path"] for s in parent["segments"]]
    # MOR append removes nothing: every parent segment is reused byte-for-byte
    # and exactly one new segment carries this commit's entries
    assert head_paths[: len(parent_paths)] == parent_paths
    assert len(head_paths) == len(parent_paths) + 1
    new_seg = json.loads(get_fs().read_text(head_paths[-1]))
    snap, psnap = table.snapshot_at(v), table.snapshot_at(v - 1)
    assert {e["path"] for e in new_seg} == {f["path"] for f in snap.files} - {
        f["path"] for f in psnap.files
    }
    # hydration reconstructs the full entry list across segments
    assert {f["path"] for f in snap.files} == {
        e["path"] for p in head_paths for e in json.loads(get_fs().read_text(p))
    }


def test_metadata_only_commit_writes_zero_segment_bytes(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    _merge(table, spark, 0, 0)
    before = _seg_files(tmp_table_dir)
    table.register_consumer("child-1", table.current().version)
    assert _seg_files(tmp_table_dir) == before  # no new segment file
    v = table.current().version
    assert _doc(table, v)["segments"] == _doc(table, v - 1)["segments"]
    assert table.current().properties["consumers"]["child-1"] == v - 1


def test_commit_metadata_cost_is_o_batch_not_o_table(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    new_seg_sizes = []
    for b in range(6):
        before = _seg_files(tmp_table_dir)
        _merge(table, spark, b, 1000 * b)
        added = _seg_files(tmp_table_dir) - before
        assert len(added) == 1
        d = os.path.join(tmp_table_dir, MANIFEST_DIR)
        new_seg_sizes.append(
            len(get_fs().read_text(os.path.join(d, added.pop())))
        )
    # equal-size batches -> the per-commit segment write stays flat while the
    # table grows 6x (a single-level manifest would grow linearly here)
    assert max(new_seg_sizes) <= 2 * min(new_seg_sizes)
    total_entries = len(table.current().files)
    head_bytes = len(get_fs().read_text(table._manifest_path(table.current().version)))
    # the snapshot JSON itself carries only schema + segment refs, not entries
    assert head_bytes < 200 * len(_doc(table, table.current().version)["segments"]) + 3000
    assert total_entries > 6  # the table did grow


def test_compaction_replaces_entries_segments_stay_consistent(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    for b in range(4):
        _merge(table, spark, b, 500 * b)
    expect = read_resolved(table).count()
    compact_table(table, tombstone_retention_ts=None)
    snap = table.current()
    assert all(f.get("kind", "base") != "delta" for f in snap.files)
    assert read_resolved(table).count() == expect
    # a follow-on data commit reuses the compacted layout's segments
    _merge(table, spark, 9, 9000)
    v = table.current().version
    head, parent = _doc(table, v), _doc(table, v - 1)
    assert [s["path"] for s in head["segments"]][: len(parent["segments"])] == [
        s["path"] for s in parent["segments"]
    ]


def test_coalesce_bounds_segment_count(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir, manifest_max_segments=3)
    for b in range(8):
        _merge(table, spark, b, 300 * b, n=6)
        assert len(_doc(table, table.current().version)["segments"]) <= 3
    # the bound holds and the table still reads exactly
    assert read_transcripts(table).count() == 8 * 6


def test_expire_reclaims_unreferenced_segments(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir, segment_gc_grace_s=0)
    for b in range(4):
        _merge(table, spark, b, 400 * b, n=6)
    live_before = read_resolved(table).count()
    table.expire_snapshots(keep_last=1)
    kept = table.current()
    referenced = {s["path"] for s in kept.segments or []}
    remaining = {
        os.path.join(tmp_table_dir, MANIFEST_DIR, f) for f in _seg_files(tmp_table_dir)
    }
    assert remaining == referenced  # nothing unreferenced survives grace=0
    assert read_resolved(table).count() == live_before


def test_expire_grace_protects_inflight_segments(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)  # default grace (1h)
    _merge(table, spark, 0, 0)
    # simulate a concurrent writer's published-but-not-yet-committed segment
    name = f"{SEGMENT_PREFIX}{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:12]}.json"
    inflight = os.path.join(tmp_table_dir, MANIFEST_DIR, name)
    get_fs().publish_if_absent(json.dumps([]), inflight)
    _merge(table, spark, 1, 100)
    table.expire_snapshots(keep_last=1)
    assert get_fs().exists(inflight)  # young orphan survives the grace window


def test_v1_inline_manifest_upgrades_on_next_commit(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    _merge(table, spark, 0, 0)
    snap = table.current()
    # hand-publish a v1 (inline-files) manifest as the next version — the
    # pre-segment format a table written by an older build would carry
    legacy = Snapshot(
        version=snap.version + 1,
        current_schema_id=snap.current_schema_id,
        schemas=snap.schemas,
        n_buckets=snap.n_buckets,
        bucket_key=snap.bucket_key,
        files=snap.files,
        txn=snap.txn,
        properties=snap.properties,
        parent=snap.version,
        committed_at=time.time(),
    )
    get_fs().publish_if_absent(legacy.to_json(), table._manifest_path(legacy.version))
    got = table.snapshot_at(legacy.version)
    assert got.segments is None  # read as inline
    assert {f["path"] for f in got.files} == {f["path"] for f in snap.files}
    _merge(table, spark, 1, 100)  # the next commit writes the two-level form
    head = _doc(table, table.current().version)
    assert "segments" in head and "files" not in head
    assert read_transcripts(table).count() == 24


def test_version_hint_fast_path_and_fallbacks(spark, tmp_table_dir):
    """current() resolves the head from version-hint.text + probe-forward
    (Iceberg's version-hint contract): a stale hint can only be BEHIND the
    head, so probing forward still lands on it; a corrupt or missing hint
    falls back to the listing. The hint is advisory — never correctness."""
    from aqueduct_core_spark.lake.table import VERSION_HINT

    table = _mk_table(spark, tmp_table_dir)
    _merge(table, spark, 0, 0)
    _merge(table, spark, 1, 100)
    head = table.current().version
    hint_path = os.path.join(tmp_table_dir, VERSION_HINT)
    assert get_fs().read_text(hint_path).strip() == str(head)
    # stale hint (a writer whose hint write was lost): probe-forward recovers
    get_fs().write_text_atomic("1", hint_path)
    assert table.current().version == head
    # corrupt hint: listing fallback
    get_fs().write_text_atomic("not-a-version", hint_path)
    assert table.current().version == head
    # missing hint: listing fallback
    get_fs().remove(hint_path)
    assert table.current().version == head
    # hint pointing at an expired manifest: listing fallback
    _merge(table, spark, 2, 200)
    table.expire_snapshots(keep_last=1)
    get_fs().write_text_atomic("1", os.path.join(tmp_table_dir, VERSION_HINT))
    assert table.current().version == table.versions()[-1]
