"""Snapshot-versioned, bucket-partitioned ACID table on parquet.

Semantics reproduced from the reference engine (see SURVEY.md sections 2.1/3.3):
  * atomic commit of a whole batch        <-> SQLite single-tx PipeEntity write
    (pipe-storage-sqlite/.../SQLiteStorage.java:134-171)
  * idempotent re-apply of a batch        <-> msg_offset PK conflict idempotence
    (SQLiteStorageIntegrationSpec.groovy:250-282)
  * single-flight maintenance             <-> Postgres advisory lock
    (PostgresqlStorage.java:503-505) — here: optimistic manifest CAS
  * routing-partition pruning             <-> per-cluster lateral scan + indexes
    (PostgresqlStorage.java:446-467) — here: manifest-level bucket pruning

Physical layout::

    root/
      _manifests/v0000000001.json     # one immutable JSON per snapshot
      data/<commit-uuid>/_bucket=<b>/part-*.parquet

A manifest lists every live data file with its bucket and schema id. Commits are
atomic via ``os.link`` (create-if-absent) of the next version file — a concurrent
winner makes the loser retry, which is exactly Iceberg's optimistic-commit model.

Scale notes (100 TB): all data stays in executors — the driver only touches the
manifest (O(number of files) JSON). Bucket pruning means a MERGE that touches K of
N buckets plans a scan over only K buckets' files; with Iceberg this maps onto
`bucket(conv_id)` partition transforms and metadata-only planning.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from aqueduct_core_spark.lake.fsio import get_fs

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
BUCKET_COL = "_bucket"


def bucket_expr(col_name: str, n_buckets: int):
    """Deterministic hash bucket of a key column (Iceberg's bucket() transform)."""
    return F.pmod(F.xxhash64(F.col(col_name)), F.lit(n_buckets)).cast("int")


@dataclass
class Snapshot:
    version: int
    current_schema_id: int
    schemas: list[dict]  # [{"schema_id": int, "json": <StructType.json()>}]
    n_buckets: int
    bucket_key: str
    files: list[dict] = field(default_factory=list)  # {path, bucket, schema_id, rows}
    txn: dict = field(default_factory=dict)  # writer_id -> last committed batch_id
    properties: dict = field(default_factory=dict)
    parent: int | None = None
    committed_at: float = 0.0

    def schema(self) -> StructType:
        for s in self.schemas:
            if s["schema_id"] == self.current_schema_id:
                return StructType.fromJson(json.loads(s["json"]))
        raise KeyError(f"schema_id {self.current_schema_id} not in manifest")

    def schema_by_id(self, schema_id: int) -> StructType:
        for s in self.schemas:
            if s["schema_id"] == schema_id:
                return StructType.fromJson(json.loads(s["json"]))
        raise KeyError(f"schema_id {schema_id} not in manifest")

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "current_schema_id": self.current_schema_id,
                "schemas": self.schemas,
                "n_buckets": self.n_buckets,
                "bucket_key": self.bucket_key,
                "files": self.files,
                "txn": self.txn,
                "properties": self.properties,
                "parent": self.parent,
                "committed_at": self.committed_at,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(**d)


class CommitConflict(Exception):
    """Another writer committed this version first — reread and retry."""


class LakeTable:
    """A snapshot-versioned table. All methods are driver-side metadata ops except
    the DataFrame reads/writes, which stay fully distributed."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------------------------------------------------------------- create/load
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        bucket_key: str,
        n_buckets: int = 16,
        properties: dict | None = None,
    ) -> "LakeTable":
        fs = get_fs()
        fs.makedirs(os.path.join(root, MANIFEST_DIR))
        fs.makedirs(os.path.join(root, DATA_DIR))
        t = cls(spark, root)
        snap = Snapshot(
            version=1,
            current_schema_id=1,
            schemas=[{"schema_id": 1, "json": schema.json()}],
            n_buckets=n_buckets,
            bucket_key=bucket_key,
            properties=properties or {},
            committed_at=time.time(),
        )
        t._write_manifest(snap)
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        fs = get_fs()
        d = os.path.join(root, MANIFEST_DIR)
        return fs.isdir(d) and any(
            f.startswith("v") and f.endswith(".json") for f in fs.listdir(d)
        )

    def current(self) -> Snapshot:
        v = self._latest_version()
        if v is None:
            raise FileNotFoundError(f"no manifest under {self.root}")
        return self.snapshot_at(v)

    def snapshot_at(self, version: int) -> Snapshot:
        return Snapshot.from_json(get_fs().read_text(self._manifest_path(version)))

    def versions(self) -> list[int]:
        d = os.path.join(self.root, MANIFEST_DIR)
        out = []
        for f in get_fs().listdir(d):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    # ---------------------------------------------------------------- read
    def read(
        self,
        buckets: Sequence[int] | None = None,
        version: int | None = None,
        with_bucket_col: bool = False,
    ) -> DataFrame:
        """Snapshot read, optionally pruned to a bucket set (manifest-level pruning:
        files in other buckets are never listed, opened, or scheduled)."""
        snap = self.current() if version is None else self.snapshot_at(version)
        target_schema = snap.schema()
        files = snap.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]

        if not files:
            df = self.spark.createDataFrame([], target_schema)
        else:
            # Group by written schema so each parquet read uses its exact file schema,
            # then align to the current schema (add-column -> NULL, widen -> cast).
            by_schema: dict[int, list[str]] = {}
            for f in files:
                by_schema.setdefault(f["schema_id"], []).append(f["path"])
            parts = []
            for schema_id, paths in by_schema.items():
                written = snap.schema_by_id(schema_id)
                part = self.spark.read.schema(written).parquet(*paths)
                parts.append(_align(part, written, target_schema))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        if with_bucket_col:
            df = df.withColumn(BUCKET_COL, bucket_expr(snap.bucket_key, snap.n_buckets))
        return df

    # ---------------------------------------------------------------- write
    def write_files(self, df: DataFrame, snap: Snapshot, kind: str = "base") -> list[dict]:
        """Write df (must carry BUCKET_COL) as one commit's data files; returns file
        entries for the manifest. Distributed write, driver-side enumeration only."""
        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.root, DATA_DIR, commit_id)
        # one shuffle keyed by bucket so each affected bucket lands in few files
        n_out = max(1, min(snap.n_buckets, self.spark.sparkContext.defaultParallelism))
        (
            df.repartition(n_out, F.col(BUCKET_COL))
            .write.partitionBy(BUCKET_COL)
            .mode("append")
            .parquet(out_dir)
        )
        entries: list[dict] = []
        for path in get_fs().walk_files(out_dir):
            base = os.path.basename(os.path.dirname(path))
            if not base.startswith(f"{BUCKET_COL}=") or not path.endswith(".parquet"):
                continue
            entries.append(
                {
                    "path": path,
                    "bucket": int(base.split("=", 1)[1]),
                    "schema_id": snap.current_schema_id,
                    "rows": None,
                    "kind": kind,  # base | delta (merge-on-read)
                }
            )
        return entries

    def try_commit(self, snap: Snapshot) -> None:
        """Atomically publish `snap` as the next version (CAS on the version file)."""
        self._write_manifest(snap)

    def discard_files(self, entries: list[dict]) -> None:
        """Delete a failed commit attempt's data files.

        The losing side of an optimistic-commit race has already written its
        parquet under data/<commit-uuid>/ but no manifest will ever reference
        it, so expire_snapshots can never reclaim it — without this, writer
        contention leaks orphan files without bound."""
        dirs = {os.path.dirname(os.path.dirname(e["path"])) for e in entries}
        fs = get_fs()
        for d in dirs:
            fs.rmtree(d)

    # ---------------------------------------------------------------- evolution
    def evolve_schema(self, new_schema: StructType) -> Snapshot:
        """Evolve-then-write (add columns / widen int->long, float->double).

        Mirrors Iceberg `ALTER TABLE ... ADD COLUMN` semantics: existing files are
        NOT rewritten; readers align old files to the new schema.
        """
        while True:
            snap = self.current()
            old = snap.schema()
            _check_compatible_evolution(old, new_schema)
            new_id = max(s["schema_id"] for s in snap.schemas) + 1
            nxt = Snapshot(
                version=snap.version + 1,
                current_schema_id=new_id,
                schemas=snap.schemas + [{"schema_id": new_id, "json": new_schema.json()}],
                n_buckets=snap.n_buckets,
                bucket_key=snap.bucket_key,
                files=snap.files,
                txn=snap.txn,
                properties=snap.properties,
                parent=snap.version,
                committed_at=time.time(),
            )
            try:
                self.try_commit(nxt)
                return nxt
            except CommitConflict:
                continue

    # ---------------------------------------------------------------- maintenance
    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop old manifests and any data files no kept snapshot references.

        The reference's VACUUM/compaction maintenance analog
        (PostgresqlStorage.java:490-497, SQLiteStorage.java:266-273).
        """
        versions = self.versions()
        if len(versions) <= keep_last:
            return 0
        keep = set(versions[-keep_last:])
        live: set[str] = set()
        for v in keep:
            live.update(f["path"] for f in self.snapshot_at(v).files)
        fs = get_fs()
        removed = 0
        for v in versions:
            if v not in keep:
                for f in self.snapshot_at(v).files:
                    if f["path"] not in live and fs.exists(f["path"]):
                        fs.remove(f["path"])
                        removed += 1
                fs.remove(self._manifest_path(v))
        # sweep empty commit dirs
        data_root = os.path.join(self.root, DATA_DIR)
        for d in fs.listdir(data_root):
            p = os.path.join(data_root, d)
            if fs.isdir(p) and not any(True for _ in fs.walk_files(p)):
                fs.rmtree(p)
        return removed

    # ---------------------------------------------------------------- internals
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, MANIFEST_DIR, f"v{version:010d}.json")

    def _latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _write_manifest(self, snap: Snapshot) -> None:
        # publish_if_absent is THE storage commit primitive (see lake/fsio.py
        # for the HDFS create(overwrite=false) / S3 conditional-PUT mapping)
        try:
            get_fs().publish_if_absent(snap.to_json(), self._manifest_path(snap.version))
        except FileExistsError as e:
            raise CommitConflict(f"version {snap.version} already committed") from e


def _align(df: DataFrame, written: StructType, target: StructType) -> DataFrame:
    """Project a file group written under an old schema onto the current schema."""
    have = {f.name: f for f in written.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            if have[f.name].dataType == f.dataType:
                cols.append(F.col(f.name))
            else:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


_WIDENINGS = {
    ("integer", "long"),
    ("integer", "double"),
    ("float", "double"),
    ("long", "double"),
    ("date", "timestamp"),
}


def _check_compatible_evolution(old: StructType, new: StructType) -> None:
    new_names = {f.name for f in new.fields}
    for f in old.fields:
        if f.name not in new_names:
            raise ValueError(f"schema evolution cannot drop column {f.name!r}")
        nf = new[f.name]
        if nf.dataType != f.dataType:
            pair = (f.dataType.typeName(), nf.dataType.typeName())
            if pair not in _WIDENINGS:
                raise ValueError(
                    f"incompatible type change for {f.name!r}: "
                    f"{f.dataType.simpleString()} -> {nf.dataType.simpleString()}"
                )
