"""Object-store fault injection through the fsio seam.

A real deployment swaps LocalFS for an S3/Hadoop FileIO whose defining
behaviors are (a) transient 503/timeout faults and (b) AMBIGUOUS SUCCESS —
a create lands server-side but the response is lost, so the client's retry
sees "already exists". These tests wrap the control plane in a deterministic
chaos FS and prove the engine's commit protocol holds: exactly-once merges,
no live-file discard after an ambiguous commit, compaction rebases that don't
double-list files, idempotent registry CAS.
"""

from __future__ import annotations

import random

import pytest

from aqueduct_core_spark.lake.fsio import (
    LocalFS,
    RetryingFS,
    TransientStorageError,
    get_fs,
    set_fs,
)
from aqueduct_core_spark.lake.merge import merge_change_batch, read_resolved
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df

_CHAOS_OPS = {
    "exists", "isdir", "makedirs", "listdir", "read_text",
    "parquet_footer", "publish_if_absent", "remove",
}


class FlakyFS:
    """Deterministic chaos wrapper: seeded pre-call transient faults on the
    control-plane ops, plus a lost-response (raise AFTER the create
    succeeded) on every `ambiguous_every`-th publish_if_absent."""

    def __init__(self, inner, seed=0, fail_rate=0.15, ambiguous_every=5):
        self.inner = inner
        self.rng = random.Random(seed)
        self.fail_rate = fail_rate
        self.ambiguous_every = ambiguous_every
        #: when set, only publishes whose path contains this substring are
        #: eligible for the lost-response fault (manifests vs segments)
        self.ambiguous_path_sub = None
        self.publishes = 0
        self.faults = 0
        self.ambiguous = 0

    def _maybe_fault(self):
        if self.fail_rate and self.rng.random() < self.fail_rate:
            self.faults += 1
            raise TransientStorageError("injected transient storage fault")

    def __getattr__(self, name):
        fn = getattr(self.inner, name)
        if name not in _CHAOS_OPS:
            return fn

        def wrapped(*args, **kwargs):
            self._maybe_fault()
            out = fn(*args, **kwargs)
            if name == "publish_if_absent":
                self.publishes += 1
                eligible = self.ambiguous_path_sub is None or (
                    self.ambiguous_path_sub in args[1]
                )
                if (
                    eligible
                    and self.ambiguous_every
                    and self.publishes % self.ambiguous_every == 0
                ):
                    self.ambiguous += 1
                    raise TransientStorageError("injected lost response (create landed)")
            return out

        return wrapped


@pytest.fixture()
def chaos_fs():
    """Install RetryingFS(FlakyFS(LocalFS)) process-wide; restore after."""
    orig = get_fs()
    flaky = FlakyFS(LocalFS())
    set_fs(RetryingFS(flaky, attempts=8, base_delay_s=0.0, sleep=lambda s: None))
    try:
        yield flaky
    finally:
        set_fs(orig)


def _feed(n=240, seed=21):
    rng = random.Random(seed)
    out = []
    for lsn in range(1, n + 1):
        conv = f"c{rng.randrange(9)}"
        if rng.random() < 0.07:
            out.append(ev(lsn, op=rng.choice(["I", "D"]), entity="conversation",
                          conv=conv, t=lsn + rng.randrange(-6, 7)))
        else:
            out.append(ev(lsn, op=rng.choice(["I", "U", "U", "D"]), conv=conv,
                          turn=rng.randrange(6), t=lsn + rng.randrange(-6, 7)))
    return out


def _visible(table):
    return [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_transcripts(table).orderBy("conv_id", "turn_idx").collect()
    ]


def test_merge_replay_exact_under_chaos(spark, tmp_path, chaos_fs):
    """Full replay with transient faults AND ambiguous commit successes on
    every control-plane operation: exactly-once still holds, no manifest or
    data file is lost, final state equals the oracle."""
    events = _feed()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
        n_buckets=4, properties={"merge_mode": "mor"},
    )
    for i in range(0, 240, 60):
        merge_change_batch(table, events_df(spark, events[i : i + 60]), batch_id=i)
    assert chaos_fs.faults > 0 and chaos_fs.ambiguous > 0  # chaos actually ran
    expected = [(r["conv_id"], r["turn_idx"], r["text"]) for r in replay(events)]
    assert _visible(table) == expected
    # every manifest-referenced file exists (nothing discarded while live)
    fs = get_fs()
    assert all(fs.exists(f["path"]) for f in table.current().files)


def test_ambiguous_commit_without_retry_layer_is_replay_safe(spark, tmp_path):
    """No RetryingFS: the lost response propagates and kills the batch (the
    driver would crash). The streaming contract replays the same batch_id —
    the txn watermark (already durably committed) must skip it and the table
    must be intact. This is the crash-between-commit-and-checkpoint test at
    the STORAGE layer."""
    orig = get_fs()
    flaky = FlakyFS(LocalFS(), fail_rate=0.0, ambiguous_every=0)
    set_fs(flaky)
    try:
        table = LakeTable.create(
            spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
            n_buckets=4, properties={"merge_mode": "mor"},
        )
        batch = events_df(spark, [ev(i, conv=f"a{i % 3}", turn=0, t=i) for i in range(1, 21)])
        flaky.ambiguous_every = 1  # next MANIFEST publish: create lands, response lost
        flaky.ambiguous_path_sub = "/v"  # the snapshot JSON, not its segment
        with pytest.raises(TransientStorageError):
            merge_change_batch(table, batch, batch_id=0)
        flaky.ambiguous_every = 0
        r = merge_change_batch(table, batch, batch_id=0)  # the replay
        assert r.skipped  # commit HAD landed; idempotence skips
        assert read_transcripts(table).count() == 3  # a0/a1/a2 latest turns
        assert all(get_fs().exists(f["path"]) for f in table.current().files)
    finally:
        set_fs(orig)


def test_ambiguous_segment_publish_is_replay_safe(spark, tmp_path):
    """Lost response on the SEGMENT publish (which precedes the snapshot
    publish): the commit never landed, so the replay must RE-APPLY — and the
    first attempt's orphaned segment must not corrupt anything."""
    orig = get_fs()
    flaky = FlakyFS(LocalFS(), fail_rate=0.0, ambiguous_every=0)
    set_fs(flaky)
    try:
        table = LakeTable.create(
            spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
            n_buckets=4, properties={"merge_mode": "mor"},
        )
        batch = events_df(spark, [ev(i, conv=f"a{i % 3}", turn=0, t=i) for i in range(1, 21)])
        flaky.ambiguous_every = 1
        flaky.ambiguous_path_sub = "seg-"  # only the segment write is ambiguous
        with pytest.raises(TransientStorageError):
            merge_change_batch(table, batch, batch_id=0)
        flaky.ambiguous_every = 0
        r = merge_change_batch(table, batch, batch_id=0)  # the replay
        assert not r.skipped  # no manifest landed -> genuine re-apply
        assert read_transcripts(table).count() == 3
        assert all(get_fs().exists(f["path"]) for f in table.current().files)
    finally:
        set_fs(orig)


def test_ambiguous_commit_with_retry_layer_keeps_live_files(spark, tmp_path):
    """RetryingFS turns the lost response into FileExistsError on retry; the
    merge's conflict handler must recognize the current manifest as ITS OWN
    commit and must NOT discard the (live) files."""
    orig = get_fs()
    flaky = FlakyFS(LocalFS(), fail_rate=0.0, ambiguous_every=0)
    set_fs(RetryingFS(flaky, attempts=4, base_delay_s=0.0, sleep=lambda s: None))
    try:
        table = LakeTable.create(
            spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
            n_buckets=4, properties={"merge_mode": "mor"},
        )
        batch = events_df(spark, [ev(i, conv=f"b{i % 4}", turn=0, t=i) for i in range(1, 17)])
        flaky.ambiguous_every = 1
        r = merge_change_batch(table, batch, batch_id=0)
        flaky.ambiguous_every = 0
        assert not r.skipped and r.version == table.current().version
        assert read_transcripts(table).count() == 4
        assert all(get_fs().exists(f["path"]) for f in table.current().files)
        # and the engine-level integrity check agrees
        from aqueduct_core_spark.streaming.engine import IngestEngine

        eng = IngestEngine(spark, str(tmp_path / "t"), str(tmp_path / "ck"))
        assert eng.validate_table()
        eng.close()
    finally:
        set_fs(orig)


def test_compaction_ambiguous_success_no_file_loss(spark, tmp_path):
    """compact_table under a lost commit response: the rewrite IS the current
    snapshot, so the conflict path must keep its files (discarding them would
    corrupt the table)."""
    from datetime import datetime

    from aqueduct_core_spark.maintenance import compact_table

    orig = get_fs()
    flaky = FlakyFS(LocalFS(), fail_rate=0.0, ambiguous_every=0)
    set_fs(RetryingFS(flaky, attempts=4, base_delay_s=0.0, sleep=lambda s: None))
    try:
        table = LakeTable.create(
            spark, str(tmp_path / "t"), TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
            n_buckets=4, properties={"merge_mode": "mor"},
        )
        events = _feed(120, seed=3)
        for i in range(0, 120, 40):
            merge_change_batch(table, events_df(spark, events[i : i + 40]), batch_id=i)
        before = _visible(table)
        flaky.ambiguous_every = 1
        stats = compact_table(table, datetime(2030, 1, 1), keep_snapshots=1)
        flaky.ambiguous_every = 0
        assert stats.version == table.current().version
        assert all(f.get("kind", "base") == "base" for f in table.current().files)
        assert all(get_fs().exists(f["path"]) for f in table.current().files)
        assert _visible(table) == before
    finally:
        set_fs(orig)


def test_registry_cas_under_chaos(tmp_path, chaos_fs):
    """PersistentNodeRegistry CAS with transient faults + lost responses:
    idempotent mutations converge, no host lost, version monotonic."""
    from aqueduct_core_spark.registry import PersistentNodeRegistry, RegistryNode

    reg = PersistentNodeRegistry(str(tmp_path / "reg"), cloud_url="c://")
    for i in range(60):
        reg.register("g", RegistryNode(host=f"h{i % 12}", local_url=f"u{i}", last_seen=float(i)))
    hosts = [n.host for n in reg.get_group("g").nodes]
    assert sorted(hosts) == sorted(f"h{i}" for i in range(12))
    assert reg.version() >= 60  # every mutation landed (ambiguous retries may add versions)


def test_retrying_fs_semantics(tmp_path):
    """RetryingFS unit contract: transient OSErrors retry with backoff up to
    `attempts`; FileExistsError / FileNotFoundError are semantic outcomes and
    propagate immediately (no retry, no sleep)."""
    calls = {"n": 0}
    sleeps: list[float] = []

    class Once:
        def read_text(self, path):
            calls["n"] += 1
            if calls["n"] < 3:
                raise TransientStorageError("503")
            return "ok"

        def publish_if_absent(self, text, path):
            raise FileExistsError(path)

        def listdir(self, path):
            raise FileNotFoundError(path)

        def exists(self, path):
            raise TransientStorageError("always down")

    fs = RetryingFS(Once(), attempts=4, base_delay_s=1.0, sleep=sleeps.append)
    assert fs.read_text("p") == "ok"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff, one per retry

    with pytest.raises(FileExistsError):
        fs.publish_if_absent("x", "p")
    with pytest.raises(FileNotFoundError):
        fs.listdir("p")
    assert len(sleeps) == 2  # semantic outcomes did not retry/sleep

    with pytest.raises(TransientStorageError):
        fs.exists("p")  # exhausted attempts re-raise the last fault
    assert len(sleeps) == 2 + 3  # attempts-1 backoffs
