"""Worker status + metrics surface — the analog of the reference's
StatusMonitor broadcasts and expvar metrics (internal/letarette/
status.go:30-260, metrics.go:32-70, pkg/protocol/protocol.go:32-76,
surfaced by cmd/lrmon).

There is no NATS bus here: a Spark deployment's "workers" are shard
indexes on shared storage, so the monitor is a registry that any number
of shard owners feed with IndexStatus snapshots (e.g. via a small
heartbeat job); health evaluation reproduces the reference's checkpoint
rules — status codes ordered worst-last, healthy shards are those at
in_sync/syncing, a shard group is incomplete when some shard index has
no fresh worker, and incompatible versions poison the group.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field

# protocol.IndexStatusCode (protocol.go:39-44): ordered, worst = highest
STATUS_IN_SYNC = 72
STATUS_SYNCING = 73
STATUS_STARTING_UP = 74
STATUS_INCOMPLETE_SHARDGROUP = 75
STATUS_INCOMPATIBLE = 76

STATUS_NAMES = {
    STATUS_IN_SYNC: "in sync",
    STATUS_SYNCING: "syncing",
    STATUS_STARTING_UP: "starting up",
    STATUS_INCOMPLETE_SHARDGROUP: "incomplete shard group",
    STATUS_INCOMPATIBLE: "incompatible protocol versions",
}

# this engine's protocol version; compatibility = same major (the
# reference compares semver compatibility, status.go:203-210)
VERSION = "1.0.0"

# a worker whose last ping is older than this is ignored (status.go:175)
STALE_AFTER_SECONDS = 30.0


@dataclass
class IndexStatus:
    """protocol.IndexStatus analog (protocol.go:62-70)."""

    index_id: str
    version: str
    doc_count: int
    last_update: float | None  # epoch seconds of the committed snapshot
    shardgroup_size: int
    shard_index: int  # 0-based, like the reference wire format
    status: int

    def __str__(self) -> str:  # protocol.go:72-76
        return (
            f"Index@{self.index_id}({self.shard_index + 1}/"
            f"{self.shardgroup_size}): {self.doc_count} docs, last update: "
            f"{self.last_update}, status: {STATUS_NAMES.get(self.status, '?')}"
        )


@dataclass
class ShardInfo:
    """A healthy shard usable as a cloning source (status.go:44-49)."""

    shardgroup_size: int
    shard_index: int
    doc_count: int


def index_status(
    index, shardgroup_size: int = 1, shard_index: int = 0
) -> IndexStatus:
    """Snapshot one index's status. 'syncing' = a build plan is in
    progress (chunks committed but the snapshot not yet flipped — the
    analog of an interest list being worked); 'in sync' otherwise.
    Delta segments are committed state, not sync debt."""
    import hashlib
    import os

    from letarette_spark.index.manifest import Manifest

    man = Manifest(index.root)
    state = index.meta
    index_id = state.get(
        "index_id", hashlib.md5(os.path.abspath(index.root).encode()).hexdigest()[:8]
    )
    current = os.path.join(index.root, "_manifest", "CURRENT.json")
    last_update = os.path.getmtime(current) if os.path.exists(current) else None
    status = (
        STATUS_SYNCING if man.lineage()["plan"] is not None else STATUS_IN_SYNC
    )
    return IndexStatus(
        index_id=index_id,
        version=VERSION,
        doc_count=int(state.get("ndocs", 0)),
        last_update=last_update,
        shardgroup_size=shardgroup_size,
        shard_index=shard_index,
        status=status,
    )


def _compatible(a: str, b: str) -> bool:
    return a.split(".", 1)[0] == b.split(".", 1)[0]


@dataclass
class StatusMonitor:
    """Registry analog of the NATS status topic: shard owners push
    IndexStatus snapshots; readers ask for healthy shards and the local
    cluster-health code. `now` is injectable for tests."""

    self_id: str
    shardgroup_size: int = 1
    shard_index: int = 0
    _status: dict = field(default_factory=dict)
    _pingtime: dict = field(default_factory=dict)

    def update(self, status: IndexStatus, now: float | None = None) -> None:
        self._status[status.index_id] = status
        self._pingtime[status.index_id] = time.time() if now is None else now

    def get_healthy_shards(self, now: float | None = None) -> list[ShardInfo]:
        """Shards (other than self) at in_sync/syncing with a fresh ping
        (status.go:120-133: candidates for shard cloning)."""
        now = time.time() if now is None else now
        out = []
        for s in self._status.values():
            if s.index_id == self.self_id:
                continue
            if now - self._pingtime.get(s.index_id, 0.0) > STALE_AFTER_SECONDS:
                continue
            if s.status <= STATUS_SYNCING:
                out.append(
                    ShardInfo(s.shardgroup_size, s.shard_index, s.doc_count)
                )
        return out

    def checkpoint(
        self, self_status: int = STATUS_IN_SYNC, now: float | None = None
    ) -> int:
        """Local cluster-health code (status.go:172-232): worst of the
        local status, version incompatibility, and shard-group coverage
        (every shard index 0..size-1 needs a fresh worker)."""
        now = time.time() if now is None else now
        code = self_status
        covered = {self.shard_index}
        for s in self._status.values():
            if now - self._pingtime.get(s.index_id, 0.0) > STALE_AFTER_SECONDS:
                continue
            if not _compatible(s.version, VERSION):
                code = max(code, STATUS_INCOMPATIBLE)
                continue
            if s.shardgroup_size == self.shardgroup_size:
                covered.add(s.shard_index)
        if any(i not in covered for i in range(self.shardgroup_size)):
            code = max(code, STATUS_INCOMPLETE_SHARDGROUP)
        return code


@dataclass
class Metrics:
    """expvar analog (metrics.go:33-39) — the same five counters the
    reference exports, JSON-serialized under lowercased names."""

    doc_requests: int = 0
    update_queue: int = 0
    pending_docs: int = 0
    served_docs: int = 0
    query_queue: int = 0

    def add(self, name: str, n: int = 1) -> None:
        setattr(self, name, getattr(self, name) + n)

    def set(self, name: str, n: int) -> None:
        setattr(self, name, n)

    def to_json(self) -> str:
        return json.dumps(
            {k.replace("_", ""): v for k, v in asdict(self).items()},
            sort_keys=True,
        )


# process-wide default registry, like the reference's package-level
# `metrics` struct; the streaming indexer and search job feed it
METRICS = Metrics()
