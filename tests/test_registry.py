"""Binary distribution-tree semantics, ported from the reference's
NodeGroup/SubNodeGroup specs (registry-core/src/test/...)."""

from __future__ import annotations

from aqueduct_core_spark.registry import Generation, NodeGroup, RegistryNode, Status

CLOUD = "http://cloud"


def node(i, status=Status.OK, gen=Generation.STRATEGIC, seen=100.0):
    return RegistryNode(
        host=f"h{i}", local_url=f"http://h{i}", status=status, generation=gen, last_seen=seen
    )


def make_group(n):
    g = NodeGroup(CLOUD)
    for i in range(n):
        g.register(node(i))
    return g


def test_first_node_follows_cloud():
    g = make_group(1)
    assert g.follow_chain("h0") == [CLOUD]


def test_binary_tree_shape():
    # node i's parent is ((i+1)//2)-1 (SubNodeGroup.java:53-65):
    # h1,h2 -> h0; h3,h4 -> h1; h5,h6 -> h2; chain carries the parent's chain
    g = make_group(7)
    assert g.follow_chain("h1") == ["http://h0", CLOUD]
    assert g.follow_chain("h2") == ["http://h0", CLOUD]
    assert g.follow_chain("h3") == ["http://h1", "http://h0", CLOUD]
    assert g.follow_chain("h4") == ["http://h1", "http://h0", CLOUD]
    assert g.follow_chain("h5") == ["http://h2", "http://h0", CLOUD]
    assert g.follow_chain("h6") == ["http://h2", "http://h0", CLOUD]
    assert g.tree_depth() == 3


def test_reregistration_keeps_position():
    g = make_group(3)
    updated = g.register(node(1, status=Status.FOLLOWING))
    assert updated.requested_to_follow == ["http://h0", CLOUD]
    assert [n.host for n in g.nodes] == ["h0", "h1", "h2"]


def test_remove_rebalances_tree():
    # NodeRegistryControllerV2IntegrationSpec.groovy:326 — deleting a node
    # rebalances: survivors shift up and follow chains recompute
    g = make_group(4)
    assert g.remove("h0")
    assert [n.host for n in g.nodes] == ["h1", "h2", "h3"]
    assert g.follow_chain("h1") == [CLOUD]
    assert g.follow_chain("h2") == ["http://h1", CLOUD]
    assert g.follow_chain("h3") == ["http://h1", CLOUD]
    assert not g.remove("nope")


def test_offline_nodes_sorted_to_leaves():
    # NodeRegistryControllerV2IntegrationSpec.groovy:364 — offline nodes move
    # to the leaves so live nodes serve near the root
    g = make_group(4)
    g.nodes[0] = RegistryNode(
        host="h0", local_url="http://h0", status=Status.OFFLINE, last_seen=100.0
    )
    g.sort_nodes()
    assert [n.host for n in g.nodes] == ["h1", "h2", "h3", "h0"]
    assert g.follow_chain("h1") == [CLOUD]
    # offline leaf (index 3) hangs under index 1 (h2), chain up to the cloud
    assert g.follow_chain("h0") == ["http://h2", "http://h1", CLOUD]


def test_legacy_generation_after_strategic():
    g = NodeGroup(CLOUD)
    g.register(node(0, gen=Generation.LEGACY))
    g.register(node(1, gen=Generation.STRATEGIC))
    g.sort_nodes()
    assert [n.host for n in g.nodes] == ["h1", "h0"]


def test_mark_and_remove_offline_thresholds():
    # 25 m mark / 7 d remove thresholds (application.yml registry block)
    g = NodeGroup(CLOUD)
    g.register(node(0, seen=50.0))
    g.register(node(1, seen=10.0))   # stale -> mark offline
    g.register(node(2, seen=1.0))    # very stale -> removed
    g.handle_offline(mark_before=20.0, remove_before=5.0)
    assert {n.host: n.status for n in g.nodes} == {
        "h0": Status.OK, "h1": Status.OFFLINE,
    }


# ---------------------------------------------------------------- persistence
def test_persistent_registry_survives_restart(tmp_path):
    """register -> restart (fresh object over the same root) -> tree and
    follow chains identical (PostgresNodeGroup persistence semantics)."""
    from aqueduct_core_spark.registry import PersistentNodeRegistry, RegistryNode

    root = str(tmp_path / "reg")
    reg = PersistentNodeRegistry(root, cloud_url="cloud://feed")
    for i in range(5):
        reg.register("uk", RegistryNode(host=f"h{i}", local_url=f"url{i}", last_seen=100.0 + i))
    reg.register("ie", RegistryNode(host="x", local_url="urlx", last_seen=50.0))
    reg.sort_nodes("uk")
    chains = {f"h{i}": reg.follow_chain("uk", f"h{i}") for i in range(5)}
    v = reg.version()

    reborn = PersistentNodeRegistry(root, cloud_url="cloud://feed")  # driver restart
    assert reborn.version() == v
    assert reborn.groups() == ["ie", "uk"]
    assert [n.host for n in reborn.get_group("uk").nodes] == [
        n.host for n in reg.get_group("uk").nodes
    ]
    for i in range(5):
        assert reborn.follow_chain("uk", f"h{i}") == chains[f"h{i}"]
    # root follows the cloud; a leaf's chain ends at the cloud
    assert chains[reborn.get_group("uk").nodes[0].host] == ["cloud://feed"]
    assert chains["h4"][-1] == "cloud://feed"

    # mutations on the reborn object keep versioning monotonic
    reborn.remove("uk", "h4")
    assert reborn.version() == v + 1
    assert len(reborn.get_group("uk").nodes) == 4


def test_persistent_registry_version_conflict_retries(tmp_path):
    """A concurrent writer stealing the next version forces the loser to
    re-read and re-apply its mutation (the reference's optimistic CAS retry,
    PostgreSQLNodeRegistry.java:57-85)."""
    from aqueduct_core_spark.registry import PersistentNodeRegistry, RegistryNode

    root = str(tmp_path / "reg")
    a = PersistentNodeRegistry(root, cloud_url="c://")
    b = PersistentNodeRegistry(root, cloud_url="c://")
    a.register("g", RegistryNode(host="a0", local_url="u0", last_seen=1.0))

    calls = {"n": 0}
    orig_commit = a._try_commit

    def racing_commit(version, groups):
        # first attempt: b sneaks in and takes this version -> CAS must fail
        if calls["n"] == 0:
            calls["n"] += 1
            b.register("g", RegistryNode(host="b0", local_url="u1", last_seen=2.0))
        return orig_commit(version, groups)

    a._try_commit = racing_commit
    a.register("g", RegistryNode(host="a1", local_url="u2", last_seen=3.0))
    hosts = [n.host for n in a.get_group("g").nodes]
    # both writers' nodes survive; the loser re-applied after re-reading
    assert hosts == ["a0", "b0", "a1"]
    assert a.version() == 3


def test_persistent_registry_version_retention(tmp_path):
    """1000 mutations must not leave 1000 version documents behind: amortized
    auto-retention bounds the directory (the reference keeps ONE row per
    group, PostgresNodeGroupStorage.java:124-126), explicit expire_versions
    tightens it further, the current version always survives, and CAS stays
    correct under a concurrent writer racing mid-stream."""
    from aqueduct_core_spark.registry import PersistentNodeRegistry, RegistryNode

    root = str(tmp_path / "reg")
    a = PersistentNodeRegistry(root, cloud_url="c://", keep_versions=64)
    b = PersistentNodeRegistry(root, cloud_url="c://", keep_versions=64)
    for i in range(1000):
        a.register("g", RegistryNode(host=f"h{i % 37}", local_url=f"u{i}", last_seen=float(i)))
        if i % 250 == 100:  # concurrent writer interleaves
            b.register("g", RegistryNode(host=f"b{i}", local_url=f"bu{i}", last_seen=float(i)))

    import os

    docs = [f for f in os.listdir(root) if f.endswith(".json")]
    assert len(docs) <= 64 + 16  # bounded: keep_versions + amortization slack
    v = a.version()
    assert v == 1004  # 1000 + 4 concurrent commits, none lost

    removed = a.expire_versions(keep_last=1)
    assert removed == len(docs) - 1
    assert [f for f in os.listdir(root) if f.endswith(".json")] == [f"v{v:010d}.json"]

    # state fully intact from the single surviving document, CAS continues
    reborn = PersistentNodeRegistry(root, cloud_url="c://")
    assert reborn.version() == v
    assert len(reborn.get_group("g").nodes) == 37 + 4
    reborn.register("g", RegistryNode(host="after", local_url="ua", last_seen=9.9))
    assert reborn.version() == v + 1
