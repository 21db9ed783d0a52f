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



def scatter_bucket(col, num: int):
    """The reference's distributed-scatter bucket rule as a Column:
    `modulo(cast(expr AS UInt64), num)` (api/rpc/flight_scatter_hash.rs
    :80-91 expr_action; plan_scheduler.rs:96 hangs this on the stage
    boundary when a cluster has N nodes).

    Spark has no unsigned 64-bit type, so the UInt64 reinterpretation
    of a negative BIGINT (v + 2^64) is computed in DECIMAL(30,0) —
    exact, no float rounding — before the modulo. The mapping claim
    this backs (SCALE.md "Cluster surface"): the reference scatters
    blocks to nodes by this bucket; Spark's exchange scatters rows to
    reducers by hash(partition expr). Repartitioning on THIS bucket
    value reproduces the reference's row->bucket co-location exactly
    (rows sharing a bucket share a partition), while the bucket->
    executor placement stays Spark's own — the part of the mapping
    that is Spark's to decide, as nodes registered via
    /v1/cluster/add never schedule Spark tasks.
    """
    from pyspark.sql import functions as F

    dec = col.cast("decimal(30,0)")
    # 2^64 exceeds a JVM long, so it travels as a string literal
    two64 = F.lit(str(2**64)).cast("decimal(30,0)")
    u64 = F.when(dec < 0, dec + two64).otherwise(dec)
    return (u64 % F.lit(num).cast("decimal(30,0)")).cast("bigint")


def scatter(df, num: int, col):
    """Repartition by the reference's scatter bucket: the Spark-side
    analog of FlightScatter::execute feeding N node streams."""
    return df.repartition(num, scatter_bucket(col, num))
