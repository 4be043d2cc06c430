"""Cluster-cache behaviors ported from the reference specs
(ClusterStorageIntegrationSpec.groovy:171-260,
PostgresqlStorageIntegrationSpec.groovy:696-883): hit/miss/expiry/invalid
paths, id assignment, and the concurrent-invalidation read retry.
"""

from __future__ import annotations

import pytest

from aqueduct_core_spark.clusters import (
    ClusterCache,
    ClusterRegistry,
    ClusterResolver,
    read_for_location,
)


def svc(mapping):
    calls = []

    def location_service(loc):
        calls.append(loc)
        return list(mapping[loc])

    location_service.calls = calls
    return location_service


def test_registry_assigns_stable_ids_insert_if_absent():
    reg = ClusterRegistry()
    assert reg.resolve_ids(["a", "b"]) == [1, 2]
    assert reg.resolve_ids(["b", "c", "a"]) == [2, 3, 1]  # existing keep ids


def test_valid_unexpired_hit_skips_location_service():
    s = svc({"loc1": ["a", "b"]})
    r = ClusterResolver(s, cache=ClusterCache(ttl_s=100))
    assert r.cluster_ids_for_read("loc1", now=0.0) == [1, 2]  # miss -> resolve
    assert r.cluster_ids_for_read("loc1", now=50.0) == [1, 2]  # hit
    assert r.location_calls == 1  # second read never called the service


def test_invalid_entry_is_reresolved_and_upserted():
    # ClusterStorageIntegrationSpec:171 "cache is updated when entry invalid"
    s = svc({"loc1": ["a"]})
    r = ClusterResolver(s, cache=ClusterCache(ttl_s=100))
    r.cluster_ids_for_read("loc1", now=0.0)
    r.cache.invalidate("loc1")
    assert r.cluster_ids_for_read("loc1", now=10.0) == [1]
    assert r.location_calls == 2
    assert r.cache.get("loc1").valid  # upsert restored valid=true


def test_expired_entry_conditionally_updated():
    s = svc({"loc1": ["a", "b"], "loc2": ["c"]})
    r = ClusterResolver(s, cache=ClusterCache(ttl_s=10))
    r.cluster_ids_for_read("loc1", now=0.0)
    # expired (now > expiry) but still valid -> conditional update path
    assert r.cluster_ids_for_read("loc1", now=20.0) == [1, 2]
    assert r.location_calls == 2
    e = r.cache.get("loc1")
    assert e.valid and e.expiry == 30.0  # refreshed


def test_invalidated_in_flight_triggers_read_retry():
    # PostgresqlStorageIntegrationSpec:775 "Read is performed twice when
    # cluster cache is invalidated while location service request is in
    # flight": the conditional update hits 0 rows, the read recurses.
    cache = ClusterCache(ttl_s=10)
    state = {"n": 0}

    def location_service(loc):
        state["n"] += 1
        if state["n"] == 2:
            # invalidation lands while this resolution is in flight
            cache.invalidate(loc)
        return ["a", "b"]

    r = ClusterResolver(location_service, cache=cache)
    r.cluster_ids_for_read("loc1", now=0.0)  # seed (call 1)
    # expired now; call 2 resolves but is invalidated mid-flight -> retry
    # makes call 3 (entry now invalid -> upsert path) and succeeds
    assert r.cluster_ids_for_read("loc1", now=20.0) == [1, 2]
    assert state["n"] == 3
    assert r.cache.get("loc1").valid


def test_gives_up_after_persistent_invalidation():
    """A conditional update that never lands (expired-valid entry kept being
    raced) must not loop forever."""
    cache = ClusterCache(ttl_s=10)
    r = ClusterResolver(lambda loc: ["a"], cache=cache, max_retries=3)
    r.cluster_ids_for_read("loc1", now=0.0)
    cache.conditional_update = lambda *a, **k: False  # type: ignore[method-assign]
    with pytest.raises(RuntimeError):
        r.cluster_ids_for_read("loc1", now=20.0)


def test_read_for_location_filters_and_pushes_down(spark):
    from aqueduct_core_spark.plans.inspect import pushed_filters

    df = spark.createDataFrame(
        [(i, i % 8) for i in range(100)], "change_lsn long, routing_id long"
    )
    s = svc({"store-1": ["c2", "c5"]})
    r = ClusterResolver(s)
    out = read_for_location(df, "store-1", r, now=0.0)
    got = sorted({x["routing_id"] for x in out.collect()})
    assert got == [1, 2]  # uuids c2,c5 -> ids 1,2
    # against a parquet source the isin reaches the scan
    import tempfile

    p = tempfile.mkdtemp() + "/ev"
    df.write.parquet(p)
    out2 = read_for_location(spark.read.parquet(p), "store-1", r, now=1.0)
    assert r.location_calls == 1  # cache hit on second read
    assert any("routing_id" in f for f in pushed_filters(out2))
