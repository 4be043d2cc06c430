"""Location -> cluster routing cache (the reference's ClusterStorage family).

The reference resolves a read's location_uuid to cluster ids through a
Postgres-backed cache with these exact behaviors (ClusterStorage.java:40-66,
ClusterCacheEntry.java, PostgresqlStorage.read:60-95, specs
ClusterStorageIntegrationSpec.groovy / PostgresqlStorageIntegrationSpec.groovy
:696-883):

  * valid + unexpired cache entry  -> use it, never call the location service;
  * missing or INVALID entry       -> resolve via the location service, assign
    ids to unseen cluster uuids (insert-if-absent), UPSERT the cache row
    (valid=true, fresh expiry);
  * present + valid but EXPIRED    -> resolve, then CONDITIONAL update
    (`... WHERE valid = true`): zero rows updated means the entry was
    invalidated while the location request was in flight — the caller must
    RETRY THE WHOLE READ (the reference's "recursive read" race handling);
  * relinking a location invalidates its entry (valid=false) so the next read
    re-resolves.

Here the cache is driver-side metadata (the reference's CLUSTERS /
CLUSTER_CACHE tables are a few thousand rows); the resolved cluster ids feed
the engine's routing filter, which Catalyst pushes into the parquet scan —
the same plan shape as the reference's per-cluster lateral read
(PostgresqlStorage.java:446-467).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ClusterCacheEntry:
    location_uuid: str
    cluster_ids: tuple[int, ...]
    expiry: float
    valid: bool

    def is_valid_and_unexpired(self, now: float) -> bool:
        # ClusterCacheEntry.isValidAndUnexpired
        return self.valid and self.expiry > now


class ClusterRegistry:
    """cluster_uuid -> cluster_id assignment: insert-if-absent with monotone
    ids (the CLUSTERS table + INSERT ... ON CONFLICT DO NOTHING)."""

    def __init__(self) -> None:
        self._ids: dict[str, int] = {}
        self._lock = threading.Lock()

    def resolve_ids(self, cluster_uuids: Sequence[str]) -> list[int]:
        with self._lock:
            for u in cluster_uuids:
                if u not in self._ids:
                    self._ids[u] = len(self._ids) + 1
            return [self._ids[u] for u in cluster_uuids]


class ClusterCache:
    """location_uuid -> ClusterCacheEntry with the reference's upsert /
    conditional-update / invalidate operations."""

    def __init__(self, ttl_s: float = 3600.0) -> None:
        self.ttl_s = ttl_s
        self._entries: dict[str, ClusterCacheEntry] = {}
        self._lock = threading.Lock()

    def get(self, location_uuid: str) -> ClusterCacheEntry | None:
        with self._lock:
            return self._entries.get(location_uuid)

    def upsert(self, location_uuid: str, cluster_ids: Sequence[int], now: float) -> None:
        """UPSERT_CLUSTER_CACHE: insert or overwrite, setting valid=true."""
        with self._lock:
            self._entries[location_uuid] = ClusterCacheEntry(
                location_uuid, tuple(cluster_ids), now + self.ttl_s, True
            )

    def conditional_update(
        self, location_uuid: str, cluster_ids: Sequence[int], now: float
    ) -> bool:
        """UPDATE_CLUSTER_CACHE (`WHERE valid = true`): returns False when the
        entry was invalidated concurrently — the caller must retry the read."""
        with self._lock:
            cur = self._entries.get(location_uuid)
            if cur is None or not cur.valid:
                return False
            self._entries[location_uuid] = ClusterCacheEntry(
                location_uuid, tuple(cluster_ids), now + self.ttl_s, True
            )
            return True

    def invalidate(self, location_uuid: str) -> None:
        """Relink/invalidation path: valid=false, next read re-resolves."""
        with self._lock:
            cur = self._entries.get(location_uuid)
            if cur is not None:
                self._entries[location_uuid] = ClusterCacheEntry(
                    cur.location_uuid, cur.cluster_ids, cur.expiry, False
                )


class ClusterResolver:
    """The read-side resolution flow of PostgresqlStorage.read:60-95."""

    def __init__(
        self,
        location_service: Callable[[str], list[str]],
        cache: ClusterCache | None = None,
        registry: ClusterRegistry | None = None,
        max_retries: int = 5,
    ) -> None:
        self.location_service = location_service
        self.cache = cache or ClusterCache()
        self.registry = registry or ClusterRegistry()
        self.max_retries = max_retries
        self.location_calls = 0  # observability for tests/metrics

    def cluster_ids_for_read(self, location_uuid: str, now: float) -> list[int]:
        for _ in range(self.max_retries):
            entry = self.cache.get(location_uuid)
            if entry is not None and entry.is_valid_and_unexpired(now):
                return list(entry.cluster_ids)

            # slow path: resolve via the location service OUTSIDE any lock
            # (the reference commits + closes its read tx before this call)
            self.location_calls += 1
            uuids = self.location_service(location_uuid)
            ids = self.registry.resolve_ids(uuids)

            if entry is None or not entry.valid:
                self.cache.upsert(location_uuid, ids, now)
                return ids
            # present + valid but expired -> conditional update; zero rows
            # means invalidated-in-flight -> recursive read (retry loop)
            if self.cache.conditional_update(location_uuid, ids, now):
                return ids
        raise RuntimeError(
            f"cluster cache for {location_uuid!r} kept invalidating; giving up"
        )


def read_for_location(
    df: DataFrame,
    location_uuid: str,
    resolver: ClusterResolver,
    now: float,
    cluster_col: str = "routing_id",
) -> DataFrame:
    """Location-routed read: resolve the location's cluster ids through the
    cache (with the race-retry semantics above) and filter the log to them —
    an `isin` Catalyst pushes into the scan, the engine's analog of the
    reference's per-cluster lateral read."""
    ids = resolver.cluster_ids_for_read(location_uuid, now)
    return df.filter(F.col(cluster_col).isin([int(i) for i in ids]))
