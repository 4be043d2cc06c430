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

from dataclasses import dataclass, field, replace
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
