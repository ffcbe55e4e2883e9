"""Device-mesh construction and sharding specs.

The reference's only parallelism is NCCL DDP with a full graph replica per
GPU (run.py:44-46, util.py:122; SURVEY.md §2.8). The TPU-native design uses a
2D mesh:

  - ``data`` axis: batch (query) parallelism — each group scores its own
    (h, r) queries; gradients pmean over this axis.
  - ``edge`` axis: graph partitioning — edge arrays are row-sharded, each
    device computes rspmm partials over its local edges, and partial node
    states combine with a single ``psum``/``pmax``/``pmin`` over the axis
    riding ICI. This is the scaling story for graphs too big to replicate
    (the analog of the O(V*d) fused-kernel trick, one level up).

Node states, parameters and the (small) relation graph are replicated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultra_tpu.graph import Graph


@dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    edge: str = "edge"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    edge: int = 1,
) -> Mesh:
    """Mesh of shape (data, edge); by default all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // edge
    assert data * edge == n, f"mesh {data}x{edge} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, edge)
    return Mesh(dev_array, ("data", "edge"))


def graph_pspec(graph: Graph, edge_axis: Optional[str] = "edge"):
    """PartitionSpec pytree (same treedef as ``graph``): entity edge arrays
    sharded over the edge axis, relation graph replicated (<= ~R^2 edges)."""
    import jax.tree_util as jtu

    plans_sharded = (
        graph.plans is not None and getattr(graph.plans, "num_shards", 0) > 0
    )

    def spec(path, leaf):
        names = [p.name for p in path if hasattr(p, "name")]
        if "relation_graph" in names or edge_axis is None:
            return P()
        if "plans" in names:
            # stacked per-shard plan tables shard on their leading axis;
            # single-device plans are replicated (and unused under sharding)
            return P(edge_axis) if plans_sharded else P()
        if "edge_weight" in names and plans_sharded:
            # the pallas path gathers weights through GLOBAL permutation
            # indices, so the weight vector stays replicated
            return P()
        if "edge_index" in names:
            return P(None, edge_axis)
        return P(edge_axis)

    return jtu.tree_map_with_path(spec, graph)


def shard_graph(mesh: Mesh, graph: Graph, edge_axis: Optional[str] = "edge") -> Graph:
    """Place a host Graph onto the mesh with edge-partitioned sharding."""
    specs = graph_pspec(graph, edge_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), graph, specs
    )
