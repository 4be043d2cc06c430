"""CLI surface: status (manifest stats), changes (changelog page), chain
(distribution-tree edge) — driven in-process through main(argv)."""

from __future__ import annotations

import json

from aqueduct_core_spark.__main__ import main
from aqueduct_core_spark.lake.merge import merge_change_batch
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def build_parent(spark, path):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
        n_buckets=4, properties={"merge_mode": "mor"},
    )
    for i in range(2):
        batch = [ev(i * 100 + j, conv=f"c{j % 3}", turn=j, t=i * 100 + j) for j in range(1, 9)]
        merge_change_batch(t, events_df(spark, batch), batch_id=i)  # v2, v3
    return t


def last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_status_reports_manifest_rows(spark, tmp_path, capsys):
    t = build_parent(spark, str(tmp_path / "p"))
    assert main(["status", "--table", str(tmp_path / "p")]) == 0
    out = last_json(capsys)
    assert out["version"] == 3 and out["delta_files"] > 0
    assert out["rows_physical"] == t.read().count() == 16


def test_changes_page_and_parquet_out(spark, tmp_path, capsys):
    build_parent(spark, str(tmp_path / "p"))
    assert main(["changes", "--table", str(tmp_path / "p"), "--since-version", "2"]) == 0
    assert last_json(capsys)["rows"] == 8  # second batch only
    out_dir = str(tmp_path / "page")
    assert main(["changes", "--table", str(tmp_path / "p"), "--since-version", "1",
                 "--out", out_dir]) == 0
    assert last_json(capsys)["rows"] == 16
    assert spark.read.parquet(out_dir).count() == 16


def test_chain_cli_converges_child(spark, tmp_path, capsys):
    parent = build_parent(spark, str(tmp_path / "p"))
    assert main(["chain", "--parent", str(tmp_path / "p"), "--table",
                 str(tmp_path / "ch"), "--buckets", "4"]) == 0
    out = last_json(capsys)
    assert out["syncs_applied"] == 1 and out["parent_version"] == 3
    child = LakeTable(spark, str(tmp_path / "ch"))
    a = [tuple(r) for r in read_transcripts(parent).orderBy("conv_id", "turn_idx").collect()]
    b = [tuple(r) for r in read_transcripts(child).orderBy("conv_id", "turn_idx").collect()]
    assert a == b and len(a) > 0


def test_chain_cli_lag_only_gauge(spark, tmp_path, capsys):
    build_parent(spark, str(tmp_path / "p"))
    assert main(["chain", "--parent", str(tmp_path / "p"), "--table",
                 str(tmp_path / "ch"), "--buckets", "4", "--lag-only"]) == 0
    lag = last_json(capsys)
    assert lag["versions_behind"] == 2 and lag["rows_behind"] == 16
    assert not lag["bootstrap_required"]
    # sync, then the embedded lag gauge reports caught-up
    assert main(["chain", "--parent", str(tmp_path / "p"), "--table",
                 str(tmp_path / "ch"), "--buckets", "4"]) == 0
    out = last_json(capsys)
    assert out["lag"]["versions_behind"] == 0 and out["lag"]["rows_behind"] == 0


def test_ingest_cli_quarantine_and_auto_compact(spark, tmp_path, capsys):
    from pyspark.sql.types import StructField, StructType

    from aqueduct_core_spark.oracle import replay
    from aqueduct_core_spark.schema import CHANGE_EVENT_SCHEMA

    clean = [ev(i, conv=f"c{i % 5}", turn=i % 3, t=i) for i in range(1, 41)]
    feed = str(tmp_path / "feed")
    events_df(spark, clean).repartition(8).write.parquet(feed)
    nullable = StructType(
        [StructField(f.name, f.dataType, True) for f in CHANGE_EVENT_SCHEMA.fields]
    )
    spark.createDataFrame(
        [(None, "I", "turn", "zz", 0, "user", "bad", None, None, 0, 1)], nullable
    ).write.mode("append").parquet(feed)

    dlq = str(tmp_path / "dlq")
    assert main([
        "ingest", "--log", feed, "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ck"), "--buckets", "4",
        "--max-files-per-trigger", "2", "--quarantine-dir", dlq,
        "--auto-compact-max-delta-files", "2",
        "--table-prop", "compaction.target_file_rows=8",
    ]) == 0
    out = last_json(capsys)
    assert out["events_quarantined"] == 1
    assert out["compactions_triggered"] > 0
    assert spark.read.parquet(dlq).count() == 1

    from aqueduct_core_spark.maintenance import CompactionPolicy, delta_pressure

    t = LakeTable(spark, str(tmp_path / "t"))
    assert all(
        n <= 2 for n, _ in delta_pressure(t.current()).values()
    )
    # --table-prop landed in the manifest and bounded the compacted files
    assert t.current().properties["compaction.target_file_rows"] == "8"
    assert all(
        f["rows"] <= 8 for f in t.current().files if f["kind"] == "base"
    )
    expected = [(r["conv_id"], r["turn_idx"], r["text"]) for r in replay(clean)]
    got = [(r["conv_id"], r["turn_idx"], r["text"])
           for r in read_transcripts(t).orderBy("conv_id", "turn_idx").collect()]
    assert got == expected


def test_chain_cli_register_offset(spark, tmp_path, capsys):
    p_root = str(tmp_path / "p")
    build_parent(spark, p_root)
    assert main(["chain", "--parent", p_root, "--table", str(tmp_path / "ch"),
                 "--buckets", "4", "--writer-id", "edge", "--register-offset"]) == 0
    consumers = LakeTable(spark, p_root).current().properties.get("consumers", {})
    assert consumers.get("edge") == 3  # the applied parent version
