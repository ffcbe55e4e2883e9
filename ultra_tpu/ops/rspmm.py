"""Generalized relational sparse matrix multiply (rspmm) for TPU.

This is the TPU-native replacement for the reference's C++/CUDA kernel family
``rspmm_{add,min,max}_{mul,add}_{forward,backward}_{cpu,cuda}``
(/root/reference/ultra/rspmm/source/rspmm.{cpp,cu}).

Semantics (the correctness-critical contract, ``rspmm.cpp:50-75``):

    out[row, f] = NaryOp_{e : dst[e] == row} ( w[e] * BinaryOp(rel[type[e], f], x[src[e], f]) )

with ``NaryOp in {add, min, max}`` (identity 0 / +inf / -inf) and
``BinaryOp in {mul (distmult), add (transe)}``. Output rows are indexed by
``edge_index[0]`` and inputs gathered from ``edge_index[1]`` — the fused-path
direction used by every shipped config.

Deviations by design (TPU-first):

- **Static shapes.** Edges are padded; an edge with ``weight == 0`` is treated
  as *absent* for every aggregator (the reference instead slices edge arrays,
  which would retrace XLA). For ``add`` this is automatic; for ``min``/``max``
  masked messages are replaced with the aggregator identity.
- **No sortedness requirement.** The reference sorts edges by (dst, src)
  before each call (``rspmm.py:174-178``); XLA segment ops do not need sorted
  ids. (The Pallas backend consumes a pre-bucketed CSR layout built once per
  graph on the host instead — see ``ultra_tpu/ops/rspmm_pallas.py``.)
- **Batched layout is node-major** ``(V, B, D)`` rather than the reference's
  transpose-to-(V, B*D) dance (``layers.py:190-192``): rows stay contiguous
  for DMA and no transposes are needed inside the hot loop.
- **Gradients** via ``jax.custom_vjp``. ``d/dx`` is itself an rspmm on the
  transposed graph; ``d/drel`` a segment-sum over edge types; ``d/dweight``
  an SDDMM-style per-edge reduction (``rspmm.cpp:106-114`` weight_grad);
  min/max route gradients to every tie, matching ``operator.cuh:62-77``.

Backends:

- ``xla``: gather + segment_{sum,min,max}; materializes (E, B, D) messages.
  Reference implementation / oracle; fine for small graphs and tests.
- ``xla_chunked``: ``lax.scan`` over edge chunks; O(chunk * B * D) temporary
  memory, suited to large graphs. Numerically identical for add; for min/max
  identical up to reduction order (exact for these ops anyway).
- ``pallas``: blocked kernel using one-hot MXU matmuls for gather+scatter
  (see rspmm_pallas.py), used on TPU when available.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SUM_OPS = ("add", "min", "max")
_MUL_OPS = ("mul", "add")

# Aggregator identities; the reference uses lowest/max finite floats
# (operator.cuh:44-60) — we use +/-inf which interacts identically with the
# downstream max(update, boundary) folding.
_IDENTITY = {"add": 0.0, "min": jnp.inf, "max": -jnp.inf}


def _binary(mul: str, rel: Array, x: Array) -> Array:
    if mul == "mul":
        return rel * x
    elif mul == "add":
        return rel + x
    raise ValueError(f"unknown mul op {mul!r}")


def _messages(edge_index, edge_type, edge_weight, relation, x, sum_op, mul_op):
    """Per-edge messages with weight-0 masking. Shapes: (E, ...)."""
    src = edge_index[1]
    msg = _binary(mul_op, jnp.take(relation, edge_type, axis=0), jnp.take(x, src, axis=0))
    w = edge_weight.reshape((-1,) + (1,) * (msg.ndim - 1))
    msg = msg * w
    if sum_op != "add":
        msg = jnp.where(w != 0.0, msg, _IDENTITY[sum_op])
    return msg


def _segment_reduce(msg, seg_ids, num_segments, sum_op):
    if sum_op == "add":
        return jax.ops.segment_sum(msg, seg_ids, num_segments=num_segments)
    elif sum_op == "min":
        return jax.ops.segment_min(msg, seg_ids, num_segments=num_segments)
    elif sum_op == "max":
        return jax.ops.segment_max(msg, seg_ids, num_segments=num_segments)
    raise ValueError(f"unknown sum op {sum_op!r}")


def _rspmm_xla(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op):
    msg = _messages(edge_index, edge_type, edge_weight, relation, x, sum_op, mul_op)
    return _segment_reduce(msg, edge_index[0], num_nodes, sum_op)


def _rspmm_xla_chunked(
    edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op, chunk
):
    e_pad = edge_index.shape[1]
    n_chunks = -(-e_pad // chunk)
    pad = n_chunks * chunk - e_pad
    if pad:
        edge_index = jnp.pad(edge_index, ((0, 0), (0, pad)))
        edge_type = jnp.pad(edge_type, (0, pad))
        edge_weight = jnp.pad(edge_weight, (0, pad))

    ei = edge_index.reshape(2, n_chunks, chunk).transpose(1, 0, 2)
    et = edge_type.reshape(n_chunks, chunk)
    ew = edge_weight.reshape(n_chunks, chunk)

    feat_shape = x.shape[1:]
    init = jnp.full((num_nodes,) + feat_shape, _IDENTITY[sum_op], dtype=x.dtype)

    def body(out, args):
        ei_c, et_c, ew_c = args
        msg = _messages(ei_c, et_c, ew_c, relation, x, sum_op, mul_op)
        if sum_op == "add":
            out = out.at[ei_c[0]].add(msg)
        elif sum_op == "min":
            out = out.at[ei_c[0]].min(msg)
        else:
            out = out.at[ei_c[0]].max(msg)
        return out, None

    out, _ = jax.lax.scan(body, init, (ei, et, ew))
    return out


def _pick_backend(backend: str, e_pad: int, feat: int) -> str:
    if backend != "auto":
        return backend
    # Keep the fully-materialized path under ~256 MB of messages.
    if e_pad * feat * 4 <= 256 * 1024 * 1024:
        return "xla"
    return "xla_chunked"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _rspmm(
    edge_index,
    edge_type,
    edge_weight,
    relation,
    x,
    num_nodes: int,
    sum_op: str,
    mul_op: str,
    backend: str,
    chunk: int,
):
    feat = int(np.prod(x.shape[1:]))
    b = _pick_backend(backend, edge_index.shape[1], feat)
    if b == "xla":
        return _rspmm_xla(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op)
    elif b == "xla_chunked":
        return _rspmm_xla_chunked(
            edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op, chunk
        )
    elif b == "pallas":
        from . import rspmm_pallas

        return rspmm_pallas.rspmm_pallas(
            edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op
        )
    raise ValueError(f"unknown backend {b!r}")


def _rspmm_fwd(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op, backend, chunk):
    out = _rspmm(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op, backend, chunk)
    if sum_op == "add":
        res = (edge_index, edge_type, edge_weight, relation, x, None)
    else:
        # min/max backward needs the chosen values to route gradients
        # (operator.cuh:62-77: grad flows where output == message, ties all get it).
        res = (edge_index, edge_type, edge_weight, relation, x, out)
    return out, res


def _rspmm_bwd(num_nodes, sum_op, mul_op, backend, chunk, res, g):
    edge_index, edge_type, edge_weight, relation, x, out = res
    dst, src = edge_index[0], edge_index[1]
    num_rel = relation.shape[0]

    def edge_grads(ei_c, et_c, ew_c):
        """Per-edge gradient factors for a chunk of edges.

        Returns (grad wrt rel[type[e]], grad wrt x[src[e]], grad wrt w[e])
        of shape (C, ...) / (C, ...) / (C,).

        Backend-contract note (sum aggregation): for weight-0 PADDING slots
        this XLA path returns the mathematically nonzero d_w = m * g[dst],
        while the Pallas path maps plan-dead slots to exactly 0 (inv_slot
        sentinel). Pad-slot weight grads are unused by every shipped
        consumer (masks multiply them away); a future consumer reading raw
        pad-slot d_w (e.g. fused edge-importance visualization) must mask
        by liveness first.
        """
        rel_e = jnp.take(relation, et_c, axis=0)
        x_e = jnp.take(x, ei_c[1], axis=0)
        g_e = jnp.take(g, ei_c[0], axis=0)
        w = ew_c.reshape((-1,) + (1,) * (g_e.ndim - 1))
        m = _binary(mul_op, rel_e, x_e)
        if sum_op == "add":
            route = w
            chosen = jnp.ones_like(w)
        else:
            out_e = jnp.take(out, ei_c[0], axis=0)
            chosen = jnp.where((m * w == out_e) & (w != 0.0), 1.0, 0.0)
            route = chosen * w
        if mul_op == "mul":
            d_rel = route * x_e * g_e
            d_x = route * rel_e * g_e
        else:  # transe: d/d(rel) = d/d(x) = 1
            d_rel = route * g_e
            d_x = route * g_e
        # d/dw (w * m) = m at routed positions (rspmm.cpp:106-114 weight_grad)
        feat_axes = tuple(range(1, g_e.ndim))
        d_w = jnp.sum(chosen * m * g_e, axis=feat_axes)
        return d_rel, d_x, d_w

    feat = int(np.prod(x.shape[1:]))
    e_pad = edge_index.shape[1]
    b = _pick_backend(backend, e_pad, feat)

    if b != "xla_chunked":
        d_rel_e, d_x_e, d_w = edge_grads(edge_index, edge_type, edge_weight)
        d_rel = jax.ops.segment_sum(d_rel_e, edge_type, num_segments=num_rel)
        d_x = jax.ops.segment_sum(d_x_e, src, num_segments=x.shape[0])
    else:
        n_chunks = -(-e_pad // chunk)
        pad = n_chunks * chunk - e_pad
        ei = jnp.pad(edge_index, ((0, 0), (0, pad))) if pad else edge_index
        et = jnp.pad(edge_type, (0, pad)) if pad else edge_type
        ew = jnp.pad(edge_weight, (0, pad)) if pad else edge_weight
        ei = ei.reshape(2, n_chunks, chunk).transpose(1, 0, 2)
        et = et.reshape(n_chunks, chunk)
        ew = ew.reshape(n_chunks, chunk)

        def body(carry, args):
            d_rel, d_x = carry
            ei_c, et_c, ew_c = args
            d_rel_e, d_x_e, d_w_c = edge_grads(ei_c, et_c, ew_c)
            d_rel = d_rel.at[et_c].add(d_rel_e)
            d_x = d_x.at[ei_c[1]].add(d_x_e)
            return (d_rel, d_x), d_w_c

        (d_rel, d_x), d_w = jax.lax.scan(
            body, (jnp.zeros_like(relation), jnp.zeros_like(x)), (ei, et, ew)
        )
        d_w = d_w.reshape(-1)[:e_pad]

    return (None, None, d_w.astype(edge_weight.dtype), d_rel, d_x)


_rspmm.defvjp(_rspmm_fwd, _rspmm_bwd)


def generalized_rspmm(
    edge_index: Array,
    edge_type: Array,
    edge_weight: Array,
    relation: Array,
    x: Array,
    *,
    sum: str = "add",
    mul: str = "mul",
    num_nodes: int | None = None,
    backend: str = "auto",
    chunk: int = 16384,
) -> Array:
    """Relational SpMM: see module docstring for exact semantics.

    Args:
      edge_index: (2, E) int32; row 0 = output rows (dst), row 1 = gathered
        inputs (src). Matches reference ``rspmm.py:167-178`` argument order.
      edge_type: (E,) int32 into ``relation`` rows.
      edge_weight: (E,) float; 0 == edge absent.
      relation: (R, ...feat) relation features.
      x: (V, ...feat) node features; feat dims of relation/x must broadcast
        elementwise (typically both are (B, D) suffixes).
      sum: aggregator, one of add/min/max.
      mul: message op, "mul" (distmult) or "add" (transe).
      num_nodes: number of output rows; defaults to ``x.shape[0]``.
      backend: "auto" | "xla" | "xla_chunked" | "pallas".

    Returns:
      (num_nodes, ...feat) aggregated output. For min/max, rows with no live
      edges contain +/-inf (callers fold the boundary condition afterwards,
      matching ``layers.py:199-219``).
    """
    if sum not in _SUM_OPS:
        raise ValueError(f"sum must be one of {_SUM_OPS}, got {sum!r}")
    if mul not in _MUL_OPS:
        raise ValueError(f"mul must be one of {_MUL_OPS}, got {mul!r}")
    if num_nodes is None:
        num_nodes = x.shape[0]
    edge_index = edge_index.astype(jnp.int32)
    edge_type = edge_type.astype(jnp.int32)
    edge_weight = edge_weight.astype(x.dtype)
    return _rspmm(
        edge_index, edge_type, edge_weight, relation, x, int(num_nodes), sum, mul, backend, chunk
    )


def rspmm_from_graph(
    graph, relation, x, *, sum="add", mul="mul", backend="auto", use_plans=True,
    precision=None,
):
    """Convenience wrapper taking an ultra_tpu.graph.Graph.

    When the graph carries precomputed Pallas plans, the Pallas kernel (with
    its own custom VJP) is used — the only viable TPU path, since XLA scatter
    does not scale there. ``use_plans=False`` forces the XLA backends (needed
    under edge sharding, where plan tables are replicated but edge arrays are
    shard-local).

    ``precision``: Pallas MXU matmul precision — None (fast, bf16 passes) or
    'highest' (exact f32, ~3-6x matmul cost) for bit-level parity runs. The
    XLA backends compute in full f32 already and ignore it.
    """
    if use_plans and graph.plans is not None and backend in ("auto", "pallas"):
        from ultra_tpu.ops.rspmm_pallas import _prec

        if sum == "add":
            from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_sum

            return rspmm_pallas_sum(
                mul, graph.num_nodes, _prec(precision), graph.plans, relation, x,
                graph.edge_weight,
            )
        from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_minmax

        return rspmm_pallas_minmax(
            graph.plans, relation, x, graph.edge_weight, mul, sum, graph.num_nodes,
            precision=precision,
        )
    return generalized_rspmm(
        graph.edge_index,
        graph.edge_type,
        graph.edge_weight,
        relation,
        x,
        sum=sum,
        mul=mul,
        num_nodes=graph.num_nodes,
        backend=backend,
    )


def spmm_max(edge_index, value, m: int, n: int, matrix) -> Array:
    """torch_sparse-style SpMM with max aggregation (query_utils.py:433-466):
    out[row] = max_col value[e] * matrix[col]. Used by symbolic traversal
    (host boolean path in query/executor.py; this device version completes
    the public API)."""
    row, col = edge_index[0], edge_index[1]
    matrix = matrix if matrix.ndim > 1 else matrix[:, None]
    msg = jnp.take(matrix, col, axis=0) * value[:, None]
    return jax.ops.segment_max(msg, row, num_segments=m)


def degree(graph, *, include_self_loop: bool = True) -> Array:
    """Live in-degree per output row (+1 for the implicit boundary self-loop,
    matching ``degree_out = degree(index) + 1`` at ``layers.py:193``)."""
    deg = jax.ops.segment_sum(
        (graph.edge_weight != 0.0).astype(jnp.float32),
        graph.edge_index[0],
        num_segments=graph.num_nodes,
    )
    return deg + 1.0 if include_self_loop else deg
