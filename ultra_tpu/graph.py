"""Static-shape graph containers for TPU-native relational message passing.

Design notes (vs the PyTorch/PyG reference, /root/reference/ultra):

The reference stores graphs as PyG ``Data`` objects with dynamically-shaped
``edge_index``/``edge_type`` tensors and *slices* them at runtime (e.g.
``remove_easy_edges``, ``base_nbfnet.py:54-77``). Dynamic shapes defeat XLA's
compile-once model, so here every graph is a pytree of **statically shaped,
padded** arrays:

- ``edge_index``  (2, E_pad) int32 — row 0 = message *destination* ("node_in"),
  row 1 = message *source* ("node_out"). This matches the fused rspmm kernel
  direction of the reference (output rows are ``edge_index[0]``, inputs are
  gathered from ``edge_index[1]``; ``rspmm.cpp:143-146``), which is the
  operative semantics for every shipped config.
- ``edge_type``   (E_pad,) int32
- ``edge_weight`` (E_pad,) float32 — **weight 0 means the edge is absent.**
  Padding edges and runtime edge removal (easy-edge dropout, traversal
  dropout) are expressed by zeroing weights instead of slicing arrays, so
  shapes stay static. All kernels in :mod:`ultra_tpu.ops.rspmm` treat
  ``weight == 0`` as "edge does not exist" for *every* aggregator (including
  min/max, where a multiplicative zero would otherwise not be neutral).

Static metadata (``num_nodes``, ``num_relations``, padded length) lives in
non-pytree fields so it is baked into the jaxpr and jit caches stay warm
across batches. Pad edge counts to coarse buckets (see ``pad_graph``) so a
handful of compiled programs covers a whole dataset zoo.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Graph:
    """A relational graph with statically shaped, padded edge arrays.

    Mirrors the fields the reference attaches to every PyG ``Data`` object
    (``edge_index``, ``edge_type``, ``num_nodes``, ``num_relations``;
    ``datasets.py:318-334``) plus the attached relation graph
    (``tasks.py:191-198``).
    """

    edge_index: jax.Array  # (2, E_pad) int32
    edge_type: jax.Array  # (E_pad,) int32
    edge_weight: jax.Array  # (E_pad,) float32; 0.0 == absent
    num_nodes: int = struct.field(pytree_node=False)
    num_relations: int = struct.field(pytree_node=False)
    # Relation graph (nodes = relation types, 4 meta-relations), built by
    # ultra_tpu.tasks.build_relation_graph. None for the relation graph itself.
    relation_graph: Optional["Graph"] = None
    # Optional ops.rspmm_pallas.GraphPlans — host-precomputed edge bucketing
    # enabling the Pallas rspmm kernel (attach via rspmm_pallas.attach_plans).
    plans: Optional[object] = None

    @property
    def num_edges_padded(self) -> int:
        return self.edge_index.shape[1]

    @property
    def edge_mask(self) -> jax.Array:
        """Boolean mask of live edges."""
        return self.edge_weight != 0.0

    @property
    def num_edges(self) -> jax.Array:
        """Traced count of live edges."""
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    def replace_weights(self, edge_weight: jax.Array) -> "Graph":
        return self.replace(edge_weight=edge_weight)


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def pad_bucket(n: int, multiple: int = 2048, growth: float = 1.0) -> int:
    """Bucketed padding size: next multiple of ``multiple`` >= n * growth."""
    return max(multiple, round_up(int(np.ceil(n * growth)), multiple))


def make_graph(
    edge_index,
    edge_type,
    num_nodes: int,
    num_relations: int,
    edge_weight=None,
    pad_to: Optional[int] = None,
    relation_graph: Optional[Graph] = None,
) -> Graph:
    """Build a padded :class:`Graph` from host arrays.

    ``edge_index`` is (2, E) laid out exactly like the reference's
    (``edge_index[0] = heads``, ``edge_index[1] = tails``). The fused kernel
    computes ``out[edge_index[0]] += w * mul(rel[type], input[edge_index[1]])``
    (``rspmm.cpp:143-146``), i.e. messages flow tail→head along each stored
    edge; datasets store both (h, t, r) and the inverse (t, h, r + R/2)
    (``datasets.py:318-319``), so both directions are covered. We keep the
    identical array convention so checkpoints and metrics transfer exactly.
    """
    edge_index = np.asarray(edge_index, dtype=np.int32)
    edge_type = np.asarray(edge_type, dtype=np.int32)
    num_edges = edge_index.shape[1]
    if edge_weight is None:
        edge_weight = np.ones(num_edges, dtype=np.float32)
    else:
        edge_weight = np.asarray(edge_weight, dtype=np.float32)

    if pad_to is None:
        pad_to = num_edges
    assert pad_to >= num_edges, (pad_to, num_edges)
    pad = pad_to - num_edges
    if pad:
        # Padding edges self-loop on node 0 / relation 0 with weight 0;
        # weight 0 makes them inert in every kernel.
        edge_index = np.concatenate(
            [edge_index, np.zeros((2, pad), dtype=np.int32)], axis=1
        )
        edge_type = np.concatenate([edge_type, np.zeros(pad, dtype=np.int32)])
        edge_weight = np.concatenate([edge_weight, np.zeros(pad, dtype=np.float32)])

    return Graph(
        edge_index=jnp.asarray(edge_index),
        edge_type=jnp.asarray(edge_type),
        edge_weight=jnp.asarray(edge_weight),
        num_nodes=int(num_nodes),
        num_relations=int(num_relations),
        relation_graph=relation_graph,
    )
