"""Index manifest: atomic snapshots + per-chunk build lineage.

Plays the role Iceberg metadata would on a production cluster (this sandbox
has no Iceberg runtime jars, so the same semantics are provided over plain
Parquet): a ``CURRENT`` pointer file is atomically replaced to commit a
snapshot, and build lineage rows record which build chunks have been
durably written — the analog of the reference's interest-list checkpointing
(/root/reference/internal/letarette/db_index.go:122-176: work units advance
pending → served, and the committed checkpoint only moves when a full list
is served; a killed build resumes without recomputing served work).

The tokenizer config is stamped into the snapshot and verified on open,
mirroring the reference's persisted stemmer state
(/root/reference/internal/letarette/stemmer.go:32-59).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any


def _atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # POSIX-atomic commit point


@dataclass
class Manifest:
    root: str
    state: dict = field(default_factory=dict)

    # ---- paths ----
    @property
    def _dir(self) -> str:
        return os.path.join(self.root, "_manifest")

    @property
    def _current(self) -> str:
        return os.path.join(self._dir, "CURRENT.json")

    @property
    def _lineage(self) -> str:
        return os.path.join(self._dir, "lineage.json")

    # ---- snapshot (query-visible commit) ----
    @classmethod
    def load(cls, root: str) -> "Manifest":
        m = cls(root)
        with open(m._current) as f:
            m.state = json.load(f)
        return m

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "_manifest", "CURRENT.json"))

    def commit_snapshot(self, meta: dict) -> None:
        prev = self.state.get("snapshot_id", 0)
        self.state = dict(meta, snapshot_id=prev + 1)
        _atomic_write_json(self._current, self.state)

    def require_analyzer(self, analyzer_key: dict) -> None:
        stamped = self.state.get("analyzer")
        if stamped != analyzer_key:
            raise ValueError(
                f"index at {self.root} was built with analyzer {stamped}, "
                f"refusing to serve with {analyzer_key} (reference behavior: "
                "stemmer.go:32-59 fails on config/index mismatch)"
            )

    # ---- build lineage (resume-without-recompute) ----
    def lineage(self) -> dict:
        if not os.path.exists(self._lineage):
            return {"plan": None, "chunks": {}}
        with open(self._lineage) as f:
            return json.load(f)

    def start_plan(self, plan: dict) -> dict:
        """Install or resume a build plan. A differing plan for the same
        root is an error unless the previous build completed."""
        lin = self.lineage()
        if lin["plan"] is not None and lin["plan"] != plan:
            raise ValueError(
                f"active build plan {lin['plan']} at {self.root} differs from "
                f"{plan}; refusing (reference: 'cannot overwrite active list', "
                "db_index.go:271-339)"
            )
        if lin["plan"] is None:
            lin = {"plan": plan, "chunks": {}}
            _atomic_write_json(self._lineage, lin)
        return lin

    def record_chunk(self, chunk_id: int, info: dict) -> None:
        lin = self.lineage()
        lin["chunks"][str(chunk_id)] = info
        _atomic_write_json(self._lineage, lin)

    def clear_plan(self) -> None:
        _atomic_write_json(self._lineage, {"plan": None, "chunks": {}})
