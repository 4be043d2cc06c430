"""Commit-metadata cost evidence for the two-level manifest.

Runs K equal-size MOR merges and records, per commit, the metadata bytes
actually written (new segment + snapshot JSON) against the bytes a
single-level inline manifest would have rewritten (the full entry list).
The two-level cost must stay ~flat while the inline cost grows linearly
with the table — that is the O(changed) vs O(table) claim in PLANS.md.

Usage: python tools/bench_manifest.py [n_commits] [rows_per_batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bench-manifest")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from pyspark.sql import functions as F

    from aqueduct_core_spark.lake.merge import merge_change_batch
    from aqueduct_core_spark.lake.table import MANIFEST_DIR, LakeTable
    from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA

    root = tempfile.mkdtemp(prefix="aq_bench_manifest_")
    try:
        table = LakeTable.create(
            spark,
            os.path.join(root, "t"),
            TRANSCRIPT_PHYSICAL_SCHEMA,
            bucket_key="conv_id",
            n_buckets=32,
            properties={"merge_mode": "mor"},
        )
        mdir = os.path.join(root, "t", MANIFEST_DIR)

        def manifest_bytes() -> dict[str, int]:
            return {
                f: os.path.getsize(os.path.join(mdir, f)) for f in os.listdir(mdir)
            }

        two_level, inline_equiv, entries_total = [], [], []
        for b in range(n_commits):
            before = manifest_bytes()
            df = (
                spark.range(b * rows, (b + 1) * rows)
                .select(
                    F.col("id").alias("change_lsn"),
                    F.lit("I").alias("op"),
                    F.lit("turn").alias("entity"),
                    F.concat(F.lit("c"), (F.col("id") % 50_000).cast("string")).alias(
                        "conv_id"
                    ),
                    (F.col("id") % 40).cast("int").alias("turn_idx"),
                    F.lit("user").alias("role"),
                    F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
                    F.lit(None).cast("string").alias("tool"),
                    F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
                    (F.col("id") % 16).cast("int").alias("routing_id"),
                    F.lit(64).alias("event_size"),
                )
            )
            merge_change_batch(table, df, batch_id=b, writer_id="bench")
            after = manifest_bytes()
            wrote = sum(v for k, v in after.items() if k not in before)
            snap = table.current()
            two_level.append(wrote)
            inline_equiv.append(len(json.dumps(snap.files)))
            entries_total.append(len(snap.files))
        # one metadata-only commit at the end: must write ~refs only
        before = manifest_bytes()
        table.register_consumer("child", table.current().version)
        meta_only = sum(
            v for k, v in manifest_bytes().items() if k not in before
        )
        print(
            json.dumps(
                {
                    "metric": "manifest_commit_bytes",
                    "n_commits": n_commits,
                    "rows_per_batch": rows,
                    "entries_final": entries_total[-1],
                    "two_level_first5_bytes": two_level[:5],
                    "two_level_last5_bytes": two_level[-5:],
                    "inline_first5_bytes": inline_equiv[:5],
                    "inline_last5_bytes": inline_equiv[-5:],
                    "metadata_only_commit_bytes": meta_only,
                    "two_level_growth": round(
                        sum(two_level[-5:]) / max(1, sum(two_level[:5])), 3
                    ),
                    "inline_growth": round(
                        sum(inline_equiv[-5:]) / max(1, sum(inline_equiv[:5])), 3
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
