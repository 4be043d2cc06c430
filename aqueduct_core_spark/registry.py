"""Self-organizing distribution tree (the reference's registry semantics).

The reference arranges each group's edge nodes into a binary tree: node i
follows node ((i+1)/2)-1, the root follows the cloud, and every node also
carries its parent's follow chain as fallbacks
(registry-core/.../SubNodeGroup.java:20,53-65). Nodes unseen for too long are
marked OFFLINE and sorted to the leaves (so live nodes sit near the root),
then eventually removed (SubNodeGroup.java:85-97,118-138; thresholds 25 m / 7 d
in application.yml).

In this engine the tree plans tiered fan-out of the change feed: each entry's
follow chain is the ordered list of upstream feed mirrors an edge ingest job
(IngestEngine with a routing filter) should tail, cloud last. It is pure
driver-side metadata — a few thousand nodes — so plain Python, exactly like
the reference's in-memory model.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, replace
from enum import IntEnum

CHILDREN_PER_NODE = 2  # binary tree (SubNodeGroup.java:20)


class Status(IntEnum):  # enum order is the sort key, as in the reference
    OK = 0
    FOLLOWING = 1
    INITIALISING = 2
    PENDING = 3
    OFFLINE = 4


class Generation(IntEnum):  # STRATEGIC before LEGACY (Node.java:125-131)
    STRATEGIC = 0
    LEGACY = 1


@dataclass
class RegistryNode:
    host: str
    local_url: str
    status: Status = Status.INITIALISING
    generation: Generation = Generation.STRATEGIC
    last_seen: float = 0.0
    offset: int = 0
    requested_to_follow: list[str] = field(default_factory=list)


class NodeGroup:
    """One location's subgroup: an ordered node list whose index defines the
    binary tree (clean-room port of SubNodeGroup semantics)."""

    def __init__(self, cloud_url: str):
        self.cloud_url = cloud_url
        self.nodes: list[RegistryNode] = []

    # ------------------------------------------------------------ tree math
    def _follow_urls(self, index: int) -> list[str]:
        """Node 0 follows the cloud; node i follows parent ((i+1)//2)-1 plus
        the parent's whole chain (fallback-up-the-tree,
        SubNodeGroup.java:53-65)."""
        if index == 0:
            return [self.cloud_url]
        parent = (index + 1) // CHILDREN_PER_NODE - 1
        p = self.nodes[parent]
        return [p.local_url] + list(p.requested_to_follow)

    def _recompute_following(self) -> None:
        for i, n in enumerate(self.nodes):
            self.nodes[i] = replace(n, requested_to_follow=self._follow_urls(i))

    # ------------------------------------------------------------ operations
    def register(self, node: RegistryNode) -> RegistryNode:
        """Upsert by host: existing nodes keep their tree position and follow
        chain (SubNodeGroup.findAndUpdate); new nodes append as a leaf."""
        for i, existing in enumerate(self.nodes):
            if existing.host == node.host:
                updated = replace(node, requested_to_follow=existing.requested_to_follow)
                self.nodes[i] = updated
                return updated
        new = replace(node, requested_to_follow=self._follow_urls(len(self.nodes)))
        self.nodes.append(new)
        return new

    def remove(self, host: str) -> bool:
        before = len(self.nodes)
        self.nodes = [n for n in self.nodes if n.host != host]
        removed = len(self.nodes) != before
        if removed:
            self._recompute_following()  # tree rebalances around the gap
        return removed

    def handle_offline(self, mark_before: float, remove_before: float) -> None:
        """Mark nodes unseen since `mark_before` OFFLINE; drop nodes unseen
        since `remove_before` (SubNodeGroup.java:85-97)."""
        self.nodes = [
            n if n.last_seen >= mark_before else replace(n, status=Status.OFFLINE)
            for n in self.nodes
        ]
        self.nodes = [n for n in self.nodes if n.last_seen >= remove_before]

    def sort_nodes(self) -> None:
        """Reference sort (SubNodeGroup.sortNodes:118-138): three stable
        passes — by status, by generation (STRATEGIC first), then offline
        nodes to the leaves — followed by follow-chain recomputation."""
        self.nodes.sort(key=lambda n: n.status)
        self.nodes.sort(key=lambda n: n.generation)
        self.nodes.sort(key=lambda n: 1 if n.status == Status.OFFLINE else 0)
        self._recompute_following()

    # ------------------------------------------------------------ inspection
    def follow_chain(self, host: str) -> list[str]:
        for n in self.nodes:
            if n.host == host:
                return list(n.requested_to_follow)
        raise KeyError(host)

    def tree_depth(self) -> int:
        import math

        return 0 if not self.nodes else int(math.log2(len(self.nodes))) + 1


# ---------------------------------------------------------------- persistence
class PersistentNodeRegistry:
    """Durable multi-group registry with optimistic version CAS.

    The reference persists each node group as one versioned row and retries on
    concurrent modification (read version -> mutate -> UPDATE ... WHERE
    version = read version; PostgreSQLNodeRegistry.java:57-85,
    PostgresNodeGroup.java:33-41). Here the group map is one immutable JSON
    document per version, published with the same atomic create-if-absent
    hard link the lake manifest commit uses (lake/table.py::_write_manifest) —
    a losing writer sees the version taken, re-reads, re-applies its mutation,
    and retries. Follow chains and tree positions therefore survive a driver
    restart: a fresh object over the same root reconstructs identical state.
    """

    def __init__(self, root: str, cloud_url: str, keep_versions: int | None = 64):
        from aqueduct_core_spark.lake.fsio import get_fs

        self.root = root
        self.cloud_url = cloud_url
        self.keep_versions = keep_versions
        self._fs = get_fs()
        self._fs.makedirs(root)

    # ------------------------------------------------------------ state io
    def _path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:010d}.json")

    def _versions(self) -> list[int]:
        return sorted(
            int(f[1:-5])
            for f in self._fs.listdir(self.root)
            if f.startswith("v") and f.endswith(".json") and ".tmp." not in f
        )

    def version(self) -> int:
        # max over the listing, not a sort — the directory is bounded by
        # retention but version() is on every read path
        return max(self._versions(), default=0)

    def expire_versions(self, keep_last: int = 64) -> int:
        """Delete version documents older than the newest `keep_last`
        (keep_last >= 1; the current version is never deleted). The lake-table
        analog of expire_snapshots, and the registry's answer to the reference
        keeping ONE row per group (PostgresNodeGroupStorage.java:124-126)
        rather than a row per mutation. Safe under concurrent writers: commits
        only ever create NEW higher versions, so deleting the old tail cannot
        race a CAS; a concurrent expirer at worst double-deletes (missing_ok).
        Returns the number of documents removed."""
        keep_last = max(1, int(keep_last))
        stale = self._versions()[:-keep_last]
        for v in stale:
            try:
                self._fs.remove(self._path(v))
            except FileNotFoundError:
                pass  # concurrent expirer got there first
        return len(stale)

    def _load(self) -> tuple[int, dict[str, NodeGroup]]:
        while True:
            v = self.version()
            if v == 0:
                return 0, {}
            try:
                doc = json.loads(self._fs.read_text(self._path(v)))
                break
            except FileNotFoundError:
                # v was expired between the listing and the read (only possible
                # if keep_versions newer commits landed in that window) —
                # re-list and read the new latest
                continue
        groups: dict[str, NodeGroup] = {}
        for name, g in doc["groups"].items():
            ng = NodeGroup(g["cloud_url"])
            ng.nodes = [
                RegistryNode(
                    host=n["host"],
                    local_url=n["local_url"],
                    status=Status(n["status"]),
                    generation=Generation(n["generation"]),
                    last_seen=n["last_seen"],
                    offset=n["offset"],
                    requested_to_follow=list(n["requested_to_follow"]),
                )
                for n in g["nodes"]
            ]
            groups[name] = ng
        return v, groups

    def _try_commit(self, version: int, groups: dict[str, NodeGroup]) -> bool:
        doc = {
            "version": version,
            "groups": {
                name: {"cloud_url": g.cloud_url, "nodes": [asdict(n) for n in g.nodes]}
                for name, g in groups.items()
            },
        }
        try:
            # same storage commit primitive as the lake manifest (fsio seam)
            self._fs.publish_if_absent(json.dumps(doc), self._path(version))
            return True
        except FileExistsError:
            return False  # concurrent writer won this version — caller retries

    def _mutate(self, group: str, fn):
        """Read-modify-CAS loop: `fn(node_group)` is re-applied from a fresh
        read after every lost race, exactly the reference's retry semantics."""
        while True:
            v, groups = self._load()
            g = groups.setdefault(group, NodeGroup(self.cloud_url))
            result = fn(g)
            if self._try_commit(v + 1, groups):
                if self.keep_versions is not None and (v + 1) % 16 == 0:
                    # amortized auto-retention: bound the directory without
                    # paying a delete sweep on every mutation
                    self.expire_versions(self.keep_versions)
                return result

    # ------------------------------------------------------------ operations
    def register(self, group: str, node: RegistryNode) -> RegistryNode:
        return self._mutate(group, lambda g: g.register(node))

    def remove(self, group: str, host: str) -> bool:
        return self._mutate(group, lambda g: g.remove(host))

    def handle_offline(self, group: str, mark_before: float, remove_before: float) -> None:
        self._mutate(group, lambda g: g.handle_offline(mark_before, remove_before))

    def sort_nodes(self, group: str) -> None:
        self._mutate(group, lambda g: g.sort_nodes())

    # ------------------------------------------------------------ inspection
    def get_group(self, group: str) -> NodeGroup:
        _, groups = self._load()
        if group not in groups:
            raise KeyError(group)
        return groups[group]

    def follow_chain(self, group: str, host: str) -> list[str]:
        return self.get_group(group).follow_chain(host)

    def groups(self) -> list[str]:
        _, gs = self._load()
        return sorted(gs)


# ---------------------------------------------------------------- consumer side
class NoAccessibleService(RuntimeError):
    """Every mirror in the follow chain is down (PipeLoadBalancer.java:38)."""


class ServiceList:
    """Consumer-side view of the follow chain: the ordered feed mirrors an
    ingest job may tail, with health state (clean-room restatement of
    ServiceList.java:80-110 + PipeServiceInstance.isUp +
    PipeLoadBalancer.select:27-39 — "first UP service wins, error when none").

    URLs here are feed directory paths (this engine's transport); the
    semantics — ordered fallback up the tree, cloud last, health-gated
    selection, re-registration updates that preserve known health — are the
    reference's."""

    def __init__(self, urls: list[str]):
        self._urls: list[str] = list(urls)
        self._up: dict[str, bool] = {u: True for u in urls}

    def update(self, urls: list[str]) -> None:
        """Adopt a new follow chain from re-registration; health state of
        still-present mirrors is preserved (a down parent stays down until
        revived)."""
        self._urls = list(urls)
        self._up = {u: self._up.get(u, True) for u in urls}

    def mark_down(self, url: str) -> None:
        if url in self._up:
            self._up[url] = False

    def mark_up(self, url: str) -> None:
        if url in self._up:
            self._up[url] = True

    def first_up(self) -> str:
        for u in self._urls:
            if self._up.get(u, False):
                return u
        raise NoAccessibleService("no accessible service to call")

    def following(self) -> list[str]:
        """All currently-UP mirrors, in follow order (getFollowing)."""
        return [u for u in self._urls if self._up.get(u, False)]

    def all_urls(self) -> list[str]:
        return list(self._urls)
