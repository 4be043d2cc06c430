"""Table maintenance: tombstone compaction + snapshot expiry + file rewrite.

The Spark restatement of the reference's scheduled compaction path
(SURVEY.md §3.3): CompactionTask cron -> advisory-locked compactAndMaintain ->
mark TTL for superseded deletes -> delete expired -> VACUUM ANALYSE
(pipe-http-server-cloud/.../CompactionTask.java:40-47,
 pipe-storage-postgresql/.../PostgresqlStorage.java:365-497).

Here: a maintenance job that rewrites the transcript table dropping tombstone
rows older than the retention threshold (they have done their late-data duty),
then expires old snapshots. Single-flight is guaranteed by the manifest's
optimistic CAS commit (a concurrent compactor loses the race and retries or
aborts) — replacing the reference's `SELECT ... FOR UPDATE NOWAIT` advisory lock.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import functions as F

from aqueduct_core_spark.lake.table import (
    BUCKET_COL,
    CommitConflict,
    LakeTable,
    Snapshot,
    bucket_expr,
    cluster_opts,
    current_spec_id,
    file_spec,
    is_mixed_spec,
)


@dataclass
class CompactionStats:
    version: int | None
    removed_snapshots: int
    skipped: bool = False


def compact_table(
    table: LakeTable,
    tombstone_retention_ts,
    keep_snapshots: int = 2,
    writer_id: str = "maintenance",
) -> CompactionStats:
    """Drop tombstone rows (turn, conversation and cascade sentinels) whose
    event time is at or below the retention threshold, rewrite all buckets,
    expire old snapshots.

    Mirrors the reference's deletion retention: tombstones younger than the
    threshold stay so that late/straggler readers still observe the delete
    (PostgresqlStorage.java:394-408; prod threshold 30 d).

    On a merge-on-read table this is ALSO the delta-fold: resolution runs once
    and the result is written back as base files, so reads go resolution-free
    again (the reference's compactUpTo over its append-only edge store)."""
    from aqueduct_core_spark.lake.merge import read_resolved

    while True:
        snap = table.current()
        # bucketed_output folds resolution + the write's bucket partitioning
        # into one exchange (resolve grouped by (bucket, key) on the already
        # bucket-partitioned scan) — the rewrite costs a single shuffle.
        df = read_resolved(table, with_bucket_col=True, bucketed_output=True)
        kept = df.filter(
            ~(F.col("_deleted") & (F.col("ts") <= F.lit(tombstone_retention_ts)))
        )
        cc, tfr = cluster_opts(snap)
        new_files = table.write_files(
            kept, snap, kind="base", already_bucketed=True,
            cluster_col=cc, max_records_per_file=tfr,
        )
        nxt = Snapshot(
            version=snap.version + 1,
            current_schema_id=snap.current_schema_id,
            schemas=snap.schemas,
            n_buckets=snap.n_buckets,
            bucket_key=snap.bucket_key,
            files=new_files,
            txn=snap.txn,
            properties={**snap.properties, "last_compaction": str(tombstone_retention_ts)},
            parent=snap.version,
            committed_at=time.time(),
        )
        try:
            table.try_commit(nxt)
            break
        except CommitConflict:
            cur = table.current()
            if any(f["path"] in {e["path"] for e in new_files} for f in cur.files):
                # ambiguous success (lost storage response): our rewrite IS
                # the current snapshot — its files are live, don't discard
                nxt = cur
                break
            table.discard_files(new_files)  # reclaim the losing attempt's files
            continue
    removed = table.expire_snapshots(keep_last=keep_snapshots)
    return CompactionStats(version=nxt.version, removed_snapshots=removed)


def compact_bucket_range(
    table: LakeTable,
    tombstone_retention_ts,
    buckets: list[int],
    writer_id: str = "maintenance",
) -> CompactionStats:
    """Compact ONLY the given bucket range as an independent job — the
    cluster-scale form of the reference's hourly CompactionTask: N disjoint
    ranges compact as N independent Spark jobs instead of one whole-table
    rewrite (CompactionTask.java:40-47 runs the whole table because Postgres
    is one node; a 64-bucket lake table wants 64-way maintenance parallelism).

    Concurrency contract (matches the reference's single-flight semantics,
    PostgresqlStorageIntegrationSpec.groovy:483-531 — no writer's data is ever
    lost to a concurrent compactor): the folded input is pinned to the
    snapshot read at entry; the commit REBASES onto the current snapshot —
    it drops exactly the files it folded and keeps every file any concurrent
    writer committed since, including new delta files in this same bucket
    range (they simply remain deltas and resolve at read until the next
    compaction pass). A lost CAS race re-rebases and retries without
    recomputing."""
    from aqueduct_core_spark.lake.merge import read_resolved

    target = set(buckets)
    snap0 = table.current()
    mixed = is_mixed_spec(snap0)
    cur_spec = current_spec_id(snap0)
    # Only CURRENT-spec files fold: old-spec entries' bucket ids live in a
    # different layout space, and they hold rows of buckets OUTSIDE the target
    # range — removing one here would lose those rows. They are retired by
    # migrate_spec_files / compact_table instead.
    folded = {
        f["path"]
        for f in snap0.files
        if f["bucket"] in target and file_spec(f) == cur_spec
    }
    if not folded:
        return CompactionStats(version=snap0.version, removed_snapshots=0, skipped=True)
    if mixed:
        # Fold exactly the selected files (read_resolved would pull old-spec
        # rows into the rewrite, duplicating them against their still-live
        # source files). LWW-superseded drops among these rows stay safe: the
        # superseding winner is in the fold, and conversation tombstones are
        # sentinel-key rows that survive resolution.
        entries = [f for f in snap0.files if f["path"] in folded]
        df = table.read_entries(entries, snap0).withColumn(
            BUCKET_COL, bucket_expr(snap0.bucket_key, snap0.n_buckets)
        )
        df = df.repartition(table.write_parallelism(snap0), F.col(BUCKET_COL))
        from aqueduct_core_spark.lake.merge import resolve_lww

        df = resolve_lww(df, group_prefix=(BUCKET_COL,))
        # NO tombstone drop while two specs coexist: a retention-expired
        # tombstone here may be the only thing suppressing an older live row
        # in an old-spec file — dropping it would resurrect that row.
        kept = df
    else:
        df = read_resolved(
            table,
            version=snap0.version,
            buckets=buckets,
            with_bucket_col=True,
            bucketed_output=True,
        )
        kept = df.filter(
            ~(F.col("_deleted") & (F.col("ts") <= F.lit(tombstone_retention_ts)))
        )
    cc, tfr = cluster_opts(snap0)
    new_files = table.write_files(
        kept, snap0, kind="base", already_bucketed=True,
        cluster_col=cc, max_records_per_file=tfr,
    )
    ours = {f["path"] for f in new_files}
    while True:
        cur = table.current()
        if any(f["path"] in ours for f in cur.files):
            # ambiguous success: our rebase commit landed but the storage
            # response was lost — rebasing again would double-list the files
            return CompactionStats(version=cur.version, removed_snapshots=0)
        files = [f for f in cur.files if f["path"] not in folded] + new_files
        nxt = Snapshot(
            version=cur.version + 1,
            current_schema_id=cur.current_schema_id,
            schemas=cur.schemas,
            n_buckets=cur.n_buckets,
            bucket_key=cur.bucket_key,
            files=files,
            txn=cur.txn,
            properties={
                **cur.properties,
                f"last_compaction_b{min(target)}_{max(target)}": str(tombstone_retention_ts),
            },
            parent=cur.version,
            committed_at=time.time(),
        )
        try:
            table.try_commit(nxt)
            return CompactionStats(version=nxt.version, removed_snapshots=0)
        except CommitConflict:
            continue  # rebase onto the new current snapshot; folded work is kept


def balance_bucket_ranges(
    rows_by_bucket: dict[int, int],
    n_buckets: int,
    n_jobs: int,
    buckets: list[int] | None = None,
) -> list[list[int]]:
    """Split buckets into n_jobs disjoint sets with near-equal row volume:
    greedy LPT (heaviest bucket to the currently-lightest job). Deterministic;
    buckets with unknown volume weigh 0 and spread round-robin by the
    tiebreak. At cluster scale this keeps one hot bucket from serializing a
    whole maintenance wave behind it. `buckets` restricts the split to a
    subset (the policy-triggered path compacts only over-threshold buckets)."""
    universe = sorted(set(buckets)) if buckets is not None else list(range(n_buckets))
    n_jobs = max(1, min(n_jobs, len(universe) or 1))
    loads = [0] * n_jobs
    jobs: list[list[int]] = [[] for _ in range(n_jobs)]
    order = sorted(universe, key=lambda b: (-rows_by_bucket.get(b, 0), b))
    for b in order:
        j = min(range(n_jobs), key=lambda i: (loads[i], len(jobs[i]), i))
        jobs[j].append(b)
        loads[j] += rows_by_bucket.get(b, 0)
    return [sorted(j) for j in jobs if j]


@dataclass(frozen=True)
class CompactionPolicy:
    """Data-driven compaction trigger thresholds (the reference's hourly
    CompactionTask cron, CompactionTask.java:40-47, made manifest-stat-driven:
    compact when the observed MOR read debt crosses a line, not when a clock
    fires). The MOR curve (BENCH_MOR_CURVE.md) shows read cost is O(delta
    files), so the primary knob is delta-file count per bucket; the row
    threshold additionally catches few-but-huge deltas."""

    max_delta_files_per_bucket: int = 8
    max_delta_rows_per_bucket: int | None = None
    n_jobs: int = 4


def delta_pressure(snap: Snapshot) -> dict[int, tuple[int, int]]:
    """Per-bucket MOR debt from manifest stats alone (no data scan):
    bucket -> (delta_file_count, delta_rows). Stat-less files count 1 row.
    Current-spec files only: old-spec entries' bucket ids address a different
    layout, and compact_bucket_range cannot retire them anyway (their debt is
    paid by migrate_spec_files)."""
    cur_spec = current_spec_id(snap)
    out: dict[int, tuple[int, int]] = {}
    for f in snap.files:
        if f.get("kind") != "delta" or file_spec(f) != cur_spec:
            continue
        n, r = out.get(f["bucket"], (0, 0))
        out[f["bucket"]] = (n + 1, r + (f.get("rows") or 1))
    return out


def buckets_over_threshold(snap: Snapshot, policy: CompactionPolicy) -> list[int]:
    hot = []
    for b, (n_files, n_rows) in delta_pressure(snap).items():
        if n_files > policy.max_delta_files_per_bucket or (
            policy.max_delta_rows_per_bucket is not None
            and n_rows > policy.max_delta_rows_per_bucket
        ):
            hot.append(b)
    return sorted(hot)


def maybe_compact(
    table: LakeTable,
    policy: CompactionPolicy,
    tombstone_retention_ts=None,
) -> list[CompactionStats]:
    """Self-tuning compaction: fold deltas in exactly the buckets whose
    manifest-recorded delta debt exceeds the policy, as load-balanced
    independent range jobs. No-op (and no Spark job) when every bucket is
    under threshold — cheap enough to call after every ingest commit.

    With tombstone_retention_ts=None no tombstone is dropped: the auto path
    only folds deltas to cap MOR read cost; tombstone GC stays an explicit
    maintenance decision with a real retention horizon (compact_table)."""
    snap = table.current()
    hot = buckets_over_threshold(snap, policy)
    if not hot:
        return []
    if tombstone_retention_ts is None:
        tombstone_retention_ts = "1970-01-01 00:00:00"  # keeps every tombstone
    rows_by_bucket: dict[int, int] = {}
    for f in snap.files:
        if f["bucket"] in set(hot):
            rows_by_bucket[f["bucket"]] = rows_by_bucket.get(f["bucket"], 0) + (
                f.get("rows") or 1
            )
    ranges = balance_bucket_ranges(
        rows_by_bucket, snap.n_buckets, policy.n_jobs, buckets=hot
    )
    if len(ranges) == 1:
        return [compact_bucket_range(table, tombstone_retention_ts, ranges[0])]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(ranges)) as ex:
        return list(
            ex.map(
                lambda r: compact_bucket_range(table, tombstone_retention_ts, r),
                ranges,
            )
        )


@dataclass
class MigrationStats:
    migrated_files: int
    remaining_files: int
    version: int
    done: bool


def migrate_spec_files(
    table: LakeTable,
    max_files: int | None = None,
    writer_id: str = "maintenance",
) -> MigrationStats:
    """Incrementally rewrite files from retired bucket specs into the current
    layout — the data-moving half of evolve_bucketing, sized by `max_files`
    per call so a 100 TB table migrates as many bounded background jobs
    instead of one big-bang rewrite (Iceberg's rewrite_data_files with a
    target spec). Each call: pick up to max_files old-spec entries, rewrite
    their rows bucketed under the current spec (kind preserved — delta rows
    stay unresolved deltas; base rows stay base), and commit a rebase that
    swaps exactly those entries. The rewritten entries are flagged
    "migrated" so changed_entries never re-emits rows a chained consumer
    already received under the original paths (which stay on disk for
    historical manifests until snapshot expiry, same as compaction folds).

    Safe against concurrent writers exactly like compact_bucket_range: input
    pinned to the entry snapshot, commit rebases, ambiguous success detected
    by our paths being live. When no old-spec files remain the table leaves
    the mixed state and full per-bucket pruning/skipping resumes."""
    snap0 = table.current()
    cur_spec = current_spec_id(snap0)
    old = [f for f in snap0.files if file_spec(f) != cur_spec]
    if not old:
        return MigrationStats(0, 0, snap0.version, done=True)
    # smallest-first: drains the long tail of tiny files quickly and keeps
    # each bounded job's input size predictable
    old.sort(key=lambda f: (f.get("rows") or 1, f["path"]))
    sel = old if max_files is None else old[: max(1, int(max_files))]
    folded = {f["path"] for f in sel}
    cc, tfr = cluster_opts(snap0)
    new_files: list[dict] = []
    for kind in ("base", "delta"):
        grp = [f for f in sel if f.get("kind", "base") == kind]
        if not grp:
            continue
        df = table.read_entries(grp, snap0).withColumn(
            BUCKET_COL, bucket_expr(snap0.bucket_key, snap0.n_buckets)
        )
        ents = table.write_files(
            df,
            snap0,
            kind=kind,
            # base rewrites keep the table's clustering contract; delta rows
            # stay unsorted like the ingest path that wrote them
            cluster_col=cc if kind == "base" else None,
            max_records_per_file=tfr if kind == "base" else None,
        )
        for e in ents:
            e["migrated"] = True
        new_files.extend(ents)
    ours = {f["path"] for f in new_files}
    while True:
        cur = table.current()
        if any(f["path"] in ours for f in cur.files):
            # ambiguous success: our rebase landed, response lost
            remaining = sum(1 for f in cur.files if file_spec(f) != current_spec_id(cur))
            return MigrationStats(len(sel), remaining, cur.version, remaining == 0)
        files = [f for f in cur.files if f["path"] not in folded] + new_files
        nxt = Snapshot(
            version=cur.version + 1,
            current_schema_id=cur.current_schema_id,
            schemas=cur.schemas,
            n_buckets=cur.n_buckets,
            bucket_key=cur.bucket_key,
            files=files,
            txn=cur.txn,
            properties=cur.properties,
            parent=cur.version,
            committed_at=time.time(),
        )
        try:
            table.try_commit(nxt)
            remaining = sum(1 for f in files if file_spec(f) != current_spec_id(nxt))
            return MigrationStats(len(sel), remaining, nxt.version, remaining == 0)
        except CommitConflict:
            continue  # rebase onto the new current; rewritten files are kept


def compact_table_parallel(
    table: LakeTable,
    tombstone_retention_ts,
    n_jobs: int = 4,
    keep_snapshots: int | None = None,
) -> list[CompactionStats]:
    """Whole-table compaction as n_jobs disjoint bucket-range jobs submitted
    concurrently (Spark schedules jobs from multiple threads; on a cluster
    each range is an independent spark-submit). Ranges are balanced by the
    manifest's per-file row counts, not bucket count. Snapshot expiry, if
    requested, runs once at the end — it is a driver-side metadata sweep."""
    from concurrent.futures import ThreadPoolExecutor

    snap = table.current()
    n_buckets = snap.n_buckets
    n_jobs = max(1, min(n_jobs, n_buckets))
    rows_by_bucket: dict[int, int] = {}
    for f in snap.files:
        rows_by_bucket[f["bucket"]] = rows_by_bucket.get(f["bucket"], 0) + (
            f.get("rows") or 1  # stat-less file: weigh by file count
        )
    ranges = balance_bucket_ranges(rows_by_bucket, n_buckets, n_jobs)
    with ThreadPoolExecutor(max_workers=n_jobs) as ex:
        stats = list(
            ex.map(
                lambda r: compact_bucket_range(table, tombstone_retention_ts, r),
                ranges,
            )
        )
    if keep_snapshots is not None:
        table.expire_snapshots(keep_last=keep_snapshots)
    return stats


def rewrite_small_files(table: LakeTable, target_files_per_bucket: int = 1) -> int:
    """Bin-pack small files per bucket (Iceberg rewrite_data_files analog;
    reference analog: SQLite VACUUM + WAL checkpoint, SQLiteStorage.java:266-273).
    Returns the new snapshot version."""
    while True:
        snap = table.current()
        by_bucket: dict[int, int] = {}
        for f in snap.files:
            by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
        if all(n <= target_files_per_bucket for n in by_bucket.values()):
            return snap.version
        from aqueduct_core_spark.lake.merge import read_resolved

        # resolve while rewriting (a MOR table's delta files fold into base
        # here) — bucketed_output keeps the whole rewrite on one exchange
        df = read_resolved(table, with_bucket_col=True, bucketed_output=True)
        # cluster for stats-tightness, but NEVER split: this op's contract is
        # the bin-pack target (target_file_rows would fight the <= check and
        # re-trigger the loop forever)
        new_files = table.write_files(
            df, snap, kind="base", already_bucketed=True,
            cluster_col=cluster_opts(snap)[0],
        )
        nxt = Snapshot(
            version=snap.version + 1,
            current_schema_id=snap.current_schema_id,
            schemas=snap.schemas,
            n_buckets=snap.n_buckets,
            bucket_key=snap.bucket_key,
            files=new_files,
            txn=snap.txn,
            properties=snap.properties,
            parent=snap.version,
            committed_at=time.time(),
        )
        try:
            table.try_commit(nxt)
            return nxt.version
        except CommitConflict:
            cur = table.current()
            if any(f["path"] in {e["path"] for e in new_files} for f in cur.files):
                return cur.version  # ambiguous success: files are live
            table.discard_files(new_files)  # reclaim the losing attempt's files
            continue
