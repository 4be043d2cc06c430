"""Filesystem seam for every driver-side metadata/file operation.

The lake's data plane is already storage-agnostic (Spark reads/writes parquet
through Hadoop FS), but the driver-side CONTROL plane — manifest publish,
orphan cleanup, bootstrap reset, validation — was written against the local
filesystem. This module is the single swap point for running against an
object store: implement the same interface over the Hadoop FileSystem API
(`spark._jvm.org.apache.hadoop.fs.FileSystem.get(...)`) or an S3 client and
inject it with `set_fs()`.

Per-method object-store mapping (what the swap implementation does):
  exists/isdir      -> FileSystem.exists / getFileStatus().isDirectory
  makedirs          -> FileSystem.mkdirs (no-op on S3 — keys are flat)
  listdir           -> FileSystem.listStatus (one LIST per call)
  walk_files        -> FileSystem.listFiles(recursive=True)
  remove/rmtree     -> FileSystem.delete(path, recursive)
  read_text         -> FSDataInputStream read
  publish_if_absent -> THE commit primitive. Local: hard-link of a fsynced
      temp file (atomic create-if-absent, POSIX). HDFS: create(path,
      overwrite=false). S3: conditional PUT (If-None-Match: *) or a DynamoDB
      lock table, exactly Iceberg's S3 commit strategies. Must raise
      FileExistsError when the destination already exists — the optimistic-
      concurrency contract every CAS loop in this repo relies on.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator


class LocalFS:
    """POSIX implementation (the only storage present in this environment)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                yield os.path.join(dirpath, fn)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def parquet_footer(self, path: str) -> dict:
        """Read a parquet file's FOOTER only (no data pages): row count plus
        per-column (min, max) where the writer recorded statistics. Local:
        pyarrow on the path. Object store: pyarrow.fs / one ranged GET of the
        footer — the same O(1)-per-file cost Iceberg pays to build manifests.
        Columns without usable stats map to None."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        cols: dict = {}
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                col = rg.column(c_i)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    cols[name] = None
                    continue
                prev = cols.get(name)
                if prev is None and name in cols:
                    continue  # an earlier row group lacked stats -> unusable
                lo, hi = (st.min, st.max) if prev is None else (
                    min(prev[0], st.min),
                    max(prev[1], st.max),
                )
                cols[name] = (lo, hi)
        return {"rows": md.num_rows, "columns": cols}

    def publish_if_absent(self, text: str, final_path: str) -> None:
        """Atomically create final_path with `text` iff it does not exist;
        raise FileExistsError when a concurrent writer won (the CAS loser).
        Durable: the content is fsynced before the link becomes visible."""
        tmp = final_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final_path)  # atomic create-if-absent
        finally:
            os.unlink(tmp)


class TransientStorageError(OSError):
    """A retryable storage fault — the S3 503 SlowDown / timeout class."""


class RetryingFS:
    """Transient-fault wrapper for any FS implementation — what a real
    object-store FileIO does internally (Iceberg's S3FileIO retry policy).

    Every operation retries TransientStorageError/OSError with exponential
    backoff. FileExistsError and FileNotFoundError are SEMANTIC results
    (CAS lost / absent path) and propagate immediately.

    publish_if_absent is retried too, which surfaces the AMBIGUOUS-SUCCESS
    case: the create landed server-side but the response was lost, so the
    retry sees FileExistsError. Every CAS loop in this engine resolves that
    correctly by re-reading state before acting on the "conflict" — the merge
    re-checks its txn watermark and whether the current manifest references
    its own files (exactly-once, no discard of live files), compaction loops
    detect their files in the current snapshot, registry/property mutations
    are idempotent re-applies. tests/test_fault_injection.py drives all of it
    under injected faults."""

    def __init__(self, inner, attempts: int = 5, base_delay_s: float = 0.01, sleep=None):
        import time as _time

        self.inner = inner
        self.attempts = max(1, attempts)
        self.base_delay_s = base_delay_s
        self._sleep = sleep if sleep is not None else _time.sleep

    def _call(self, name: str, *args, **kwargs):
        last = None
        for attempt in range(self.attempts):
            try:
                return getattr(self.inner, name)(*args, **kwargs)
            except (FileExistsError, FileNotFoundError):
                raise  # semantic outcome, not a fault
            except OSError as e:
                last = e
                if attempt + 1 < self.attempts:
                    self._sleep(self.base_delay_s * (2**attempt))
        raise last

    def exists(self, path):
        return self._call("exists", path)

    def isdir(self, path):
        return self._call("isdir", path)

    def makedirs(self, path):
        return self._call("makedirs", path)

    def listdir(self, path):
        return self._call("listdir", path)

    def walk_files(self, root):
        # materialized so a mid-iteration fault retries the whole listing
        last = None
        for attempt in range(self.attempts):
            try:
                return iter(list(self.inner.walk_files(root)))
            except OSError as e:
                last = e
                if attempt + 1 < self.attempts:
                    self._sleep(self.base_delay_s * (2**attempt))
        raise last

    def remove(self, path):
        return self._call("remove", path)

    def rmtree(self, path):
        return self._call("rmtree", path)

    def read_text(self, path):
        return self._call("read_text", path)

    def parquet_footer(self, path):
        return self._call("parquet_footer", path)

    def publish_if_absent(self, text, final_path):
        return self._call("publish_if_absent", text, final_path)


_FS = LocalFS()


def get_fs():
    return _FS


def set_fs(fs) -> None:
    """Inject an alternative implementation (Hadoop FS / S3) process-wide."""
    global _FS
    _FS = fs
