"""Evidence for per-bucket stats file-skipping on a live MOR table: a
time/LSN-windowed read on a mostly-compacted table must open O(matching
files), not O(all files), even while some bucket holds live delta files
(lake/merge.py read_resolved derives the delta-bucket exempt set per
bucket; before r5 ANY delta file disabled skipping globally).

Reference analog: the offset-indexed page read never scans outside the
requested window (SQLiteQueries.java:77-99).

The production shape: `n_batches` of history across every bucket, a full
compaction (each bucket one base file whose _lsn stats end at the history
high-water mark), then continued ingest confined to HOT conversations (one
bucket) — the cold majority stays delta-free while the table as a whole is
always "live". A read windowed to the fresh _lsn range must open only the
hot bucket's files: the 63 cold base files' stats exclude the window (the
old global rule opened all of them because one delta existed SOMEWHERE).
Reports files opened + wall seconds for (a) the windowed read and (b) the
same filter over an unpruned full read. File counts are deterministic
(host-independent); wall times depend on the shared host.

Usage: python tools/bench_window_read.py [n_events] [n_batches] -> JSON line
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aqueduct_core_spark.feedgen import generate_change_feed
    from aqueduct_core_spark.lake.merge import merge_change_batch, read_resolved
    from aqueduct_core_spark.lake.table import LakeTable
    from aqueduct_core_spark.maintenance import compact_bucket_range
    from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("aqueduct-window-read-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = tempfile.mkdtemp(dir="/dev/shm")
    feed = generate_change_feed(
        spark,
        n_events=n_events,
        n_convs=max(1000, n_events // 20),
        turns_per_conv=20,
        seed=42,
        skew=1.3,
        n_hot=5,
        p_hot=0.05,
        ts_jitter_s=60,
        dup_frac=0.01,
    ).cache()
    hi_lsn = feed.agg(F.max("change_lsn")).collect()[0][0]
    step = (hi_lsn + n_batches - 1) // n_batches

    t = LakeTable.create(
        spark,
        f"{d}/tbl",
        TRANSCRIPT_PHYSICAL_SCHEMA,
        bucket_key="conv_id",
        n_buckets=64,
        properties={"merge_mode": "mor"},
    )
    from aqueduct_core_spark.lake.table import bucket_expr

    # history: all buckets, the first (n_batches - 2) lsn slices
    hist_batches = n_batches - 2
    for b in range(hist_batches):
        merge_change_batch(
            t,
            feed.filter(
                (F.col("change_lsn") > b * step) & (F.col("change_lsn") <= (b + 1) * step)
            ),
            batch_id=b,
        )
    # full compaction: every bucket folds to one base file whose _lsn stats
    # end at the history high-water mark
    compact_bucket_range(t, tombstone_retention_ts="1970-01-01 00:00:00", buckets=list(range(64)))

    # continued ingest: only HOT conversations (bucket 0) keep writing —
    # the cold 63 buckets stay delta-free while the table is always live
    hot = feed.filter(bucket_expr("conv_id", 64) == 0)
    for b in range(hist_batches, n_batches):
        merge_change_batch(
            t,
            hot.filter(
                (F.col("change_lsn") > b * step) & (F.col("change_lsn") <= (b + 1) * step)
            ),
            batch_id=b,
        )
    feed.unpersist()
    snap = t.current()
    total_files = len(snap.files)
    delta_files = sum(1 for f in snap.files if f.get("kind") == "delta")

    # the window: the fresh tail of the log (the post-compaction slices)
    w_lo, w_hi = hist_batches * step, n_batches * step
    win = read_resolved(t, ranges={"_lsn": (w_lo + 1, w_hi)})
    full = read_resolved(t).filter((F.col("_lsn") > w_lo) & (F.col("_lsn") <= w_hi))
    win.count(), full.count()  # warm-up pass: JVM/codegen, not under timing

    # INTERLEAVED best-of: the shared host drifts on a seconds scale, so
    # timing one query's burst after the other's would attribute the drift
    # to the plan; alternating runs hit both plans with the same host state
    def timed(df):
        t0 = time.perf_counter()
        rows = df.count()
        return rows, time.perf_counter() - t0

    w_times, f_times = [], []
    for _ in range(4):
        rows_window, dt = timed(win)
        w_times.append(dt)
        rows_full, dt = timed(full)
        f_times.append(dt)
    sec_window, sec_full = round(min(w_times), 3), round(min(f_times), 3)
    files_window = len(set(win.inputFiles()))
    files_full = len(set(full.inputFiles()))

    assert rows_window == rows_full, (rows_window, rows_full)

    # --- scenario 2: a TIME window INSIDE history on a time-clustered table.
    # Without clustering, compaction folds each bucket into one file spanning
    # the whole history — a mid-history ts window can never skip. With
    # compaction.target_file_rows set, the fold sorts each bucket by ts and
    # chops at the cap, so the window opens only the files whose disjoint ts
    # ranges intersect it.
    rows_per_bucket = n_events // 64
    t2 = LakeTable.create(
        spark,
        f"{d}/tbl_clustered",
        TRANSCRIPT_PHYSICAL_SCHEMA,
        bucket_key="conv_id",
        n_buckets=64,
        properties={
            "merge_mode": "mor",
            # ~16 files per bucket -> a 1/16 window should open ~1-2 per bucket
            "compaction.target_file_rows": str(max(1, rows_per_bucket // 16)),
        },
    )
    feed.persist()
    for b in range(n_batches):
        merge_change_batch(
            t2,
            feed.filter(
                (F.col("change_lsn") > b * step) & (F.col("change_lsn") <= (b + 1) * step)
            ),
            batch_id=b,
        )
    compact_bucket_range(t2, tombstone_retention_ts="1970-01-01 00:00:00", buckets=list(range(64)))
    feed.unpersist()
    snap2 = t2.current()
    ts_lo = min(f["stats"]["ts"][0] for f in snap2.files if f.get("stats", {}).get("ts"))
    ts_hi = max(f["stats"]["ts"][1] for f in snap2.files if f.get("stats", {}).get("ts"))
    import datetime as _dt

    span = ts_hi - ts_lo
    w2_lo = _dt.datetime.fromtimestamp((ts_lo + span * 7 // 16) / 1e6, tz=_dt.timezone.utc)
    w2_hi = _dt.datetime.fromtimestamp((ts_lo + span * 8 // 16) / 1e6, tz=_dt.timezone.utc)
    win2 = read_resolved(t2, ranges={"ts": (w2_lo, w2_hi)})
    full2 = read_resolved(t2).filter((F.col("ts") >= w2_lo) & (F.col("ts") <= w2_hi))
    win2.count(), full2.count()  # warm-up
    w2_times, f2_times = [], []
    for _ in range(4):
        rows_w2, dt2 = timed(win2)
        w2_times.append(dt2)
        rows_f2, dt2 = timed(full2)
        f2_times.append(dt2)
    assert rows_w2 == rows_f2, (rows_w2, rows_f2)
    files_w2 = len(set(win2.inputFiles()))
    files_f2 = len(set(full2.inputFiles()))

    print(
        json.dumps(
            {
                "metric": "windowed read on live MOR (per-bucket stats skipping)",
                "n_events": n_events,
                "n_batches": n_batches,
                "n_buckets": 64,
                "files_total": total_files,
                "files_delta_live": delta_files,
                "window_rows": rows_window,
                "windowed_read": {"files_opened": files_window, "sec": sec_window},
                "unpruned_read": {"files_opened": files_full, "sec": sec_full},
                "files_ratio": round(files_window / max(files_full, 1), 3),
                "ts_window_on_clustered_compaction": {
                    "files_total": len(snap2.files),
                    "window_rows": rows_w2,
                    "windowed_read": {
                        "files_opened": files_w2,
                        "sec": round(min(w2_times), 3),
                    },
                    "unpruned_read": {
                        "files_opened": files_f2,
                        "sec": round(min(f2_times), 3),
                    },
                    "files_ratio": round(files_w2 / max(files_f2, 1), 3),
                },
            }
        )
    )
    spark.stop()
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
