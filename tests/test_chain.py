"""Chained pipes: child (and grandchild) tables tail their parent's changelog
and converge to the same observable state as the parent and the pure-Python
oracle — the reference's distribution-tree consumption model
(SubNodeGroup.java tree + HttpPipeClient.java tail loop) over lake tables."""

from __future__ import annotations

import random

from aqueduct_core_spark.lake.merge import merge_change_batch
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.oracle import replay
from aqueduct_core_spark.schema import TRANSCRIPT_PHYSICAL_SCHEMA
from aqueduct_core_spark.streaming.chain import ChainedConsumer
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def make_parent(spark, path):
    return LakeTable.create(
        spark, path, TRANSCRIPT_PHYSICAL_SCHEMA, bucket_key="conv_id",
        n_buckets=4, properties={"merge_mode": "mor"},
    )


def feed_events(n=300, seed=7):
    rng = random.Random(seed)
    out = []
    for lsn in range(1, n + 1):
        conv = f"c{rng.randrange(8)}"
        if rng.random() < 0.08:
            out.append(ev(lsn, op=rng.choice(["I", "D"]), entity="conversation",
                          conv=conv, t=lsn + rng.randrange(-6, 7)))
        else:
            out.append(ev(lsn, op=rng.choice(["I", "U", "U", "D"]), conv=conv,
                          turn=rng.randrange(6), t=lsn + rng.randrange(-6, 7)))
    return out


def visible(table):
    return [tuple(r) for r in read_transcripts(table).orderBy("conv_id", "turn_idx").collect()]


def test_child_and_grandchild_converge_interleaved(spark, tmp_path):
    events = feed_events()
    parent = make_parent(spark, str(tmp_path / "p"))
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))
    grand = ChainedConsumer(spark, str(tmp_path / "ch"), str(tmp_path / "g"))
    # interleave: parent ingests a batch, child syncs (sometimes), grandchild lags
    for i in range(0, 300, 60):
        merge_change_batch(parent, events_df(spark, events[i : i + 60]), batch_id=i)
        if i % 120 == 0:
            child.sync_once()
    child.run_until_caught_up()
    grand.run_until_caught_up()
    expected = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in replay(events)
    ]
    assert visible(parent) == expected
    assert visible(LakeTable(spark, str(tmp_path / "ch"))) == expected
    assert visible(LakeTable(spark, str(tmp_path / "g"))) == expected


def test_sync_is_idempotent_and_noop_when_caught_up(spark, tmp_path):
    parent = make_parent(spark, str(tmp_path / "p"))
    merge_change_batch(parent, events_df(spark, feed_events(50)), batch_id=0)
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))
    r1 = child.sync_once()
    assert r1.applied and not r1.bootstrapped
    v_after = LakeTable(spark, str(tmp_path / "ch")).current().version
    r2 = child.sync_once()
    assert not r2.applied
    assert LakeTable(spark, str(tmp_path / "ch")).current().version == v_after


def test_child_past_retention_bootstraps_from_snapshot(spark, tmp_path):
    events = feed_events(180, seed=9)
    parent = make_parent(spark, str(tmp_path / "p"))
    for i in range(0, 180, 60):
        merge_change_batch(parent, events_df(spark, events[i : i + 60]), batch_id=i)
    parent.expire_snapshots(keep_last=1)  # child's interval manifests are gone
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))
    r = child.sync_once()
    assert r.applied and r.bootstrapped
    expected = [
        (e["conv_id"], e["turn_idx"], e["role"], e["text"], e["tool"], e["ts"])
        for e in replay(events)
    ]
    assert visible(LakeTable(spark, str(tmp_path / "ch"))) == expected


def test_schema_follow_down_the_chain(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    parent = make_parent(spark, str(tmp_path / "p"))
    merge_change_batch(parent, events_df(spark, feed_events(40, seed=3)), batch_id=2)
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))
    child.sync_once()
    # parent evolves (add column), then commits more data
    evolved = StructType(
        list(TRANSCRIPT_PHYSICAL_SCHEMA.fields) + [StructField("lang", StringType(), True)]
    )
    parent.evolve_schema(evolved)
    merge_change_batch(parent, events_df(spark, feed_events(40, seed=4)), batch_id=3)
    child.run_until_caught_up()
    child_t = LakeTable(spark, str(tmp_path / "ch"))
    assert "lang" in [f.name for f in child_t.current().schema().fields]
    assert visible(child_t) == visible(parent)  # incl. the NULL lang column


def test_widen_only_evolution_follows_down_the_chain(spark, tmp_path):
    """A widen changes NO field names, so a name-based schema follow would
    miss it and the child's merge would cast the parent's long values back to
    int (silent narrowing; ANSI error once a value exceeds int range)."""
    from pyspark.sql.types import LongType, StructField, StructType

    parent = make_parent(spark, str(tmp_path / "p"))
    merge_change_batch(parent, events_df(spark, feed_events(40, seed=5)), batch_id=2)
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))
    child.sync_once()
    widened = StructType(
        [
            StructField("turn_idx", LongType(), f.nullable)
            if f.name == "turn_idx"
            else f
            for f in TRANSCRIPT_PHYSICAL_SCHEMA.fields
        ]
    )
    parent.evolve_schema(widened)
    merge_change_batch(parent, events_df(spark, feed_events(40, seed=6)), batch_id=3)
    child.run_until_caught_up()
    child_t = LakeTable(spark, str(tmp_path / "ch"))
    child_types = {f.name: f.dataType for f in child_t.current().schema().fields}
    assert isinstance(child_types["turn_idx"], LongType)
    assert visible(child_t) == visible(parent)


def test_fanout_tree_lag_gauges_and_midstream_bootstrap(spark, tmp_path):
    """Fan-out TREE, not a chain: parent feeds two children at different
    cadences, a grandchild tails child A. Child B falls past the parent's
    snapshot retention MID-STREAM and bootstraps, then resumes incremental
    tailing. Lag gauges (versions-behind / rows-behind, the reference's
    per-node offset lag in NodeRegistryControllerV2) are asserted against the
    manifest ground truth throughout, and every node ends oracle-equal."""
    events = feed_events(360, seed=13)
    p_root, a_root, b_root, g_root = (str(tmp_path / n) for n in "pabg")
    parent = make_parent(spark, p_root)
    a = ChainedConsumer(spark, p_root, a_root, writer_id="childA")
    b = ChainedConsumer(spark, p_root, b_root, writer_id="childB")
    g = ChainedConsumer(spark, a_root, g_root, writer_id="grand")

    batches = [events[i : i + 40] for i in range(0, 360, 40)]  # 9 parent commits
    a_results, b_results = [], []
    for i, batch in enumerate(batches):
        merge_change_batch(parent, events_df(spark, batch), batch_id=i)
        if i == 4:
            # B has never synced: behind every data commit, lag quantified
            # from manifests alone and equal to the live delta row total
            lag_b = b.lag()
            assert lag_b.versions_behind == 5 and not lag_b.bootstrap_required
            delta_rows = sum(
                f.get("rows") or 0
                for f in parent.current().files
                if f.get("kind") == "delta"
            )
            assert lag_b.rows_behind == delta_rows > 0
        if i % 2 == 0:
            lag_a = a.lag()
            assert 0 < lag_a.versions_behind <= 2
            assert 0 < lag_a.rows_behind <= 2 * 40  # dedup only shrinks batches
            a_results.append(a.sync_once())
            assert a.lag().caught_up
        if i % 4 == 0:
            g.sync_once()
        if i == 5:
            # retention passes B by (keep A's resume window alive)
            parent.expire_snapshots(keep_last=2)
            lag_b = b.lag()
            assert lag_b.bootstrap_required and lag_b.rows_behind is None
            assert lag_b.versions_behind == 6
            r = b.sync_once()
            assert r.applied and r.bootstrapped
            b_results.append(r)
        elif i > 5:
            b_results.append(b.sync_once())  # incremental again post-bootstrap

    a_results += a.run_until_caught_up()
    g.run_until_caught_up()
    b_results += b.run_until_caught_up()
    assert not any(r.bootstrapped for r in a_results)  # A tailed incrementally
    assert sum(r.bootstrapped for r in b_results) == 1  # B bootstrapped once
    for c in (a, b, g):
        assert c.lag().caught_up and c.lag().rows_behind == 0

    expected = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in replay(events)
    ]
    assert visible(parent) == expected
    for root in (a_root, b_root, g_root):
        assert visible(LakeTable(spark, root)) == expected


def test_consumer_aware_retention_keeps_resume_interval(spark, tmp_path):
    """Children that register offsets (the reference's node offset
    re-registration) pin the parent's retention floor: aggressive
    expire_snapshots(keep_last=1, respect_consumers=True) after every commit
    still leaves the slow child an incremental resume path — no bootstrap —
    while old manifests beyond the floor ARE pruned. A dead consumer past
    max_consumer_lag is evicted and stops pinning retention. Metadata-only
    intervals (the registrations themselves) don't ratchet syncs."""
    events = feed_events(240, seed=17)
    p_root = str(tmp_path / "p")
    parent = make_parent(spark, p_root)
    fast = ChainedConsumer(spark, p_root, str(tmp_path / "f"),
                           writer_id="fast", register_offset=True)
    slow = ChainedConsumer(spark, p_root, str(tmp_path / "s"),
                           writer_id="slow", register_offset=True)

    for i, lo in enumerate(range(0, 240, 60)):
        merge_change_batch(parent, events_df(spark, events[lo : lo + 60]), batch_id=i)
        fast.run_until_caught_up()
        if i == 0:
            slow.run_until_caught_up()  # slow stops syncing after batch 0
        parent.expire_snapshots(keep_last=1, respect_consumers=True)

    # retention respected the slow child: its interval is fully replayable
    lag = slow.lag()
    assert lag.versions_behind > 0 and not lag.bootstrap_required
    assert 0 < lag.rows_behind <= 180  # batches 1-3 (intra-batch LWW shrinks)
    results = slow.run_until_caught_up()
    assert not any(r.bootstrapped for r in results)  # incremental, no bootstrap
    # but expiry DID prune manifests older than the floor
    assert min(LakeTable(spark, p_root).versions()) > 1

    expected = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in replay(events)
    ]
    for root in ("f", "s"):
        assert visible(LakeTable(spark, str(tmp_path / root))) == expected

    # metadata-only interval: a caught-up child does not chase registrations
    r = fast.sync_once()
    assert not r.applied
    assert fast.lag().caught_up and fast.lag().rows_behind == 0

    # dead-consumer eviction: a registration far behind stops pinning
    parent.register_consumer("dead", 2)
    merge_change_batch(parent, events_df(spark, [ev(900, conv="zz", turn=0, t=900)]),
                       batch_id=99)
    parent.expire_snapshots(keep_last=2, respect_consumers=True, max_consumer_lag=3)
    snap = LakeTable(spark, p_root).current()
    assert "dead" not in snap.properties.get("consumers", {})
    assert min(LakeTable(spark, p_root).versions()) > 2


def test_lag_statless_delta_entries_count_pending(spark, tmp_path, monkeypatch):
    """A delta entry WITHOUT footer row stats still holds pending data: the
    lag gauge must count it as at least 1 row so caught_up cannot read true
    while un-applied files exist (--lag-only must not report a stale child as
    current just because a manifest entry lost its stats)."""
    import aqueduct_core_spark.streaming.chain as chain_mod

    events = feed_events(n=60)
    parent = make_parent(spark, str(tmp_path / "p"))
    merge_change_batch(parent, events_df(spark, events), batch_id=0)
    child = ChainedConsumer(spark, str(tmp_path / "p"), str(tmp_path / "ch"))

    real = chain_mod.changed_entries

    def strip_stats(table, since, until):
        added, snap = real(table, since, until)
        return [{k: v for k, v in f.items() if k != "rows"} for f in added], snap

    monkeypatch.setattr(chain_mod, "changed_entries", strip_stats)
    lag = child.lag()
    assert lag.versions_behind > 0 and not lag.bootstrap_required
    assert lag.rows_behind >= 1  # floor, not 0
    assert not lag.caught_up


def test_registration_racing_expiry_keeps_resume_floor(spark, tmp_path, monkeypatch):
    """A consumer registration that lands DURING expire_snapshots — after the
    expiry read the consumer map, before it acted — must not lose its resume
    floor: the floor-bump CAS conflicts, the expiry recomputes with the new
    registration visible, and the child resumes incrementally (never
    bootstraps). Deterministic re-enactment of the old race window."""
    p_root = str(tmp_path / "p")
    parent = make_parent(spark, p_root)
    events = feed_events(n=120)
    batches = [events[i : i + 30] for i in range(0, 120, 30)]
    merge_change_batch(parent, events_df(spark, batches[0]), batch_id=0)

    child = ChainedConsumer(spark, p_root, str(tmp_path / "ch"))
    child.run_until_caught_up()
    applied = child.applied_version()
    # parent advances: keep_last=2 alone would expire the child's floor
    for b, batch in enumerate(batches[1:], start=1):
        merge_change_batch(parent, events_df(spark, batch), batch_id=b)
    assert applied < sorted(parent.versions())[-2]  # the window is real

    real_commit = LakeTable.try_commit
    injected = {"fired": False}

    def racing_commit(self, snap):
        if not injected["fired"] and "retention_floor" in snap.properties:
            injected["fired"] = True
            # the racing registration is CAS-ordered BEFORE the floor commit
            LakeTable(spark, p_root).register_consumer("chain", applied)
        return real_commit(self, snap)

    monkeypatch.setattr(LakeTable, "try_commit", racing_commit)
    parent.expire_snapshots(keep_last=2, respect_consumers=True)
    monkeypatch.setattr(LakeTable, "try_commit", real_commit)
    assert injected["fired"]

    # the floor survived: every manifest from the child's applied version on
    assert min(LakeTable(spark, p_root).versions()) <= applied
    results = child.run_until_caught_up()
    assert any(r.applied for r in results)
    assert not any(r.bootstrapped for r in results)  # incremental resume

    expected = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in replay(events)
    ]
    assert visible(LakeTable(spark, str(tmp_path / "ch"))) == expected
