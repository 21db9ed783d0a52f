"""Cluster-membership registry (clusters/cluster.rs:23-27): a
thread-safe name->node map with priority/address/sequence. Pure
metadata — stdlib only — so it lives in core, imported by BOTH the
engine (system.clusters) and the HTTP API front-end; the servers
package layers ON TOP of the engine, never the other way around."""

from __future__ import annotations

import threading


class ClusterRegistry:
    """name -> {name, priority, address, local, sequence} (node.rs
    fields minus the flight connection). Thread-safe like the
    reference's Mutex<HashMap> (cluster.rs:26)."""

    def __init__(self):
        self._nodes: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._seq = 0

    def add_node(self, name: str, priority: int, address: str) -> None:
        if not 0 <= priority <= 10:
            # reference: "Priority is in [0, 10]" (cluster.rs:18-20)
            raise ValueError(f"Priority out of [0, 10]: {priority}")
        with self._lock:
            if name in self._nodes:
                # cluster.rs add_node errors on Occupied entry
                raise ValueError(f"Node name already exists: {name}")
            self._nodes[name] = {
                "name": name,
                "priority": priority,
                "address": address,
                "local": False,
                "sequence": self._seq,
            }
            self._seq += 1

    def remove_node(self, name: str) -> None:
        with self._lock:
            self._nodes.pop(name, None)

    def get_nodes(self) -> list[dict]:
        with self._lock:
            return sorted(self._nodes.values(), key=lambda n: n["sequence"])

