"""Pallas TPU kernel for the generalized relational SpMM (sum aggregation).

Replaces the reference CUDA kernel (rspmm.cu) with a design matched to TPU
hardware rather than warp semantics:

- **No scatter.** XLA scatter (segment_sum) on TPU serializes and is
  unusable at KG scale (measured: does not complete for 544K edges). The
  whole reduction is reformulated as dense MXU matmuls with one-hot
  selection matrices — the "scatter-via-matmul" pattern.
- **2D edge tiling.** Edges are bucketed on the host once per graph into
  (reduce_block, gather_block) tiles of the sparse adjacency and padded to
  chunks of C edges (PallasPlan). Each grid step processes one chunk:

    G     = onehot(local_gather_ids)          (C, RBg)
    xg    = G @ X_block                       (C, F)   gather via MXU
    relg  = onehot(types) @ REL               (C, F)   relation lookup
    msg   = xg * relg            (distmult)   or xg + relg (transe)
    S     = onehot(local_reduce_ids) * w      (C, RBr) weights fold into S
    OUT  += S^T @ msg                         (RBr, F) scatter via MXU

- **Output revisiting.** Chunks are ordered so all chunks of one output
  block are consecutive; the output block stays resident in VMEM across
  them (zeroed on first visit via scalar-prefetched block ids).
- **Weights stay dynamic.** The plan stores a permutation into the graph's
  (padded) edge-weight vector, so per-batch easy-edge masks (weight 0) flow
  through without rebuilding the plan.
- Feature axis is blocked (outer grid dim) so arbitrary B*D works with
  bounded VMEM; accumulation is always f32 (MXU preferred_element_type).

Backward (see rspmm.py custom_vjp): d_x is the same kernel on the
transposed plan (reduce over src, gather d_out by dst); d_rel reduces over
relation types with both V-side operands gathered (kernel variant with two
blocked gathers and a single resident output block).

The semantics contract matches rspmm.cpp:50-75 for all six variants:
{add, min, max} x {mul, add}. min/max run as segmented scans over
reduce-sorted chunks with a select-last matmul (see _minmax_kernel) and
tie-routed backward kernels, mirroring operator.cuh:44-80.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Widest feature axis the v2 kernels serve. Wider shapes (pretrain bs 64
# -> F=4096 under remat) measured FASTER on the v1 FLOP-bound kernels than
# on the sliced gather streams (full-v1 1694 vs v2-fwd-only 2059 vs
# full-v2 2088 ms/step on-chip) — at that width the materialized streams
# churn the HBM the remat pass needs. F<=2048 covers the eval and
# fine-tune shapes where v2 wins 1.5-1.8x. Env override for width-gate
# sweeps (scripts/exp_pretrain_width.py).
import os as _os

V2_MAX_F = int(_os.environ.get("ULTRA_V2_MAX_F", "2048"))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def _prec(precision):
    """Normalize a precision knob to a lax.Precision (or None).

    The MXU natively multiplies bf16: with DEFAULT precision an f32 matmul
    runs as a single bf16 pass, so the one-hot gather/scatter matmuls
    truncate the gathered VALUES to bf16 (~1.5e-2 mean rel err vs f64 on
    chip). 'highest' requests full-f32 multi-pass matmuls (~3-6x MXU work)
    for exact-f32 parity runs; interpret mode (CPU) is always exact."""
    if isinstance(precision, str):
        precision = None if precision.lower() == "default" else jax.lax.Precision(
            precision.lower()
        )
    if precision is None or precision == jax.lax.Precision.DEFAULT:
        return None
    if precision == jax.lax.Precision.HIGHEST:
        return precision
    # Mosaic only lowers DEFAULT and HIGHEST (lowering.py dot_general rule)
    raise ValueError(
        f"pallas rspmm supports precision None/'default' or 'highest', got {precision}"
    )


def auto_rb(num_nodes: int, num_edges: int, num_relations: int, chunk: int = 128,
            edge_index=None) -> int:
    """Pick the tile row-block size minimizing cost per edge:
    (gather + type + reduce matmul width) x chunk-padding waste. Small
    graphs favor small blocks (less one-hot work); large sparse graphs need
    big blocks or the (V/rb)^2 tile count drowns everything in padding.

    With ``edge_index`` the padding waste is computed exactly (one bincount
    per candidate); otherwise a tiles*C/2 estimate is used."""
    r_pad = max(_round_up(num_relations, 8), 8)
    if edge_index is not None:
        dst = np.asarray(edge_index[0], dtype=np.int64)
        src = np.asarray(edge_index[1], dtype=np.int64)
    best, best_cost = 384, float("inf")
    for rb in (128, 256, 384, 512, 768, 1024, 1536, 2048):
        n_blk = -(-num_nodes // rb)
        if edge_index is not None and num_edges:
            tile = (dst // rb) * n_blk + (src // rb)
            counts = np.bincount(tile)
            chunks = int((-(-counts[counts > 0] // chunk)).sum())
            waste = chunks * chunk / num_edges
        else:
            waste = 1.0 + n_blk * n_blk * chunk / (2.0 * max(num_edges, 1))
        cost = (2 * rb + r_pad) * waste
        if cost < best_cost:
            best, best_cost = rb, cost
    return best


@struct.dataclass
class PallasPlan:
    """Host-precomputed edge bucketing for one traversal order of a graph.

    ``order='reduce'`` arrays: chunk k holds C edges all of whose reduce
    indices fall in block ``reduce_blk[k]`` and gather indices in
    ``gather_blk[k]``; chunks sorted so equal reduce blocks are adjacent.
    """

    reduce_blk: jax.Array  # (K,) int32 — output block id per chunk
    gather_blk: jax.Array  # (K,) int32 — input block id per chunk
    local_reduce: jax.Array  # (K, C) int32 in [0, rb_reduce)
    local_gather: jax.Array  # (K, C) int32 in [0, rb_gather)
    types: jax.Array  # (K, C) int32 in [0, r_pad)
    perm: jax.Array  # (K, C) int32 into the (E_pad+1,) extended weight vector
    covered: jax.Array  # (n_reduce_blocks,) f32 — 1 if any chunk writes block
    num_chunks: int = struct.field(pytree_node=False)
    chunk: int = struct.field(pytree_node=False)
    rb_reduce: int = struct.field(pytree_node=False)
    rb_gather: int = struct.field(pytree_node=False)
    n_reduce_pad: int = struct.field(pytree_node=False)  # padded output rows
    n_gather_pad: int = struct.field(pytree_node=False)  # padded input rows
    r_pad: int = struct.field(pytree_node=False)  # padded relation rows
    # (dead_slot+1,) int32: edge id -> flat slot index in the (K*C,) chunk
    # layout (K*C for ids with no slot). Inverts `perm` so per-slot weight
    # gradients can be gathered back to edge order (rspmm.cpp:106-114).
    inv_slot: Optional[jax.Array] = None


def build_plan(
    edge_index: np.ndarray,  # (2, E) live edges, [dst, src]
    edge_type: np.ndarray,
    num_nodes: int,
    num_relations: int,
    *,
    reduce_side: str = "dst",  # 'dst' (forward) | 'src' (input-grad)
    rb_reduce: int = 384,
    rb_gather: int = 384,
    chunk: int = 128,
    edge_ids: Optional[np.ndarray] = None,  # ids into the runtime weight vec
    dead_slot: Optional[int] = None,  # weight index holding a constant 0.0
    pad_chunks_to: Optional[int] = None,  # fixed chunk count (jit stability)
) -> PallasPlan:
    """Bucket edges into (reduce_blk, gather_blk) tiles, pad each tile's edge
    list to a multiple of ``chunk``. O(E log E) host work, once per graph."""
    ei = np.asarray(edge_index)
    et = np.asarray(edge_type).astype(np.int64)
    dst, src = ei[0].astype(np.int64), ei[1].astype(np.int64)
    red, gat = (dst, src) if reduce_side == "dst" else (src, dst)
    e = red.shape[0]
    if edge_ids is None:
        edge_ids = np.arange(e, dtype=np.int64)

    n_red_blk = _round_up(num_nodes, rb_reduce) // rb_reduce
    n_gat_blk = _round_up(num_nodes, rb_gather) // rb_gather
    tile = (red // rb_reduce) * n_gat_blk + (gat // rb_gather)
    # secondary sort by reduce id: chunks become segment-sorted, which the
    # min/max kernels need for their segmented scans (sum is order-invariant)
    order = np.lexsort((red, tile))
    tile_s = tile[order]

    # per-tile counts -> padded chunk layout
    uniq, counts = np.unique(tile_s, return_counts=True)
    padded = (-(-counts // chunk)) * chunk
    total = int(padded.sum())
    k = total // chunk

    # scatter sorted edges into padded slots
    starts = np.cumsum(padded) - padded
    within = np.arange(e, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    slots = np.repeat(starts, counts) + within

    # padding slots carry the sentinel reduce id rb_reduce: outside the
    # one-hot width (no contribution) and keeps per-chunk reduce ids
    # monotone, which the segmented min/max scan relies on
    local_reduce = np.full(total, rb_reduce, dtype=np.int32)
    local_gather = np.zeros(total, dtype=np.int32)
    types = np.zeros(total, dtype=np.int32)
    if dead_slot is None:
        dead_slot = int(e)  # caller appends a zero to the weight vector
    perm = np.full(total, dead_slot, dtype=np.int64)  # padding -> dead slot
    local_reduce[slots] = (red[order] % rb_reduce).astype(np.int32)
    local_gather[slots] = (gat[order] % rb_gather).astype(np.int32)
    types[slots] = et[order].astype(np.int32)
    perm[slots] = edge_ids[order]

    chunk_tile = np.repeat(uniq, padded // chunk) if k else np.zeros(0, np.int64)
    reduce_blk = (chunk_tile // n_gat_blk).astype(np.int32)
    gather_blk = (chunk_tile % n_gat_blk).astype(np.int32)

    if pad_chunks_to is not None:
        # Pad to a fixed chunk count with all-dead chunks so graphs whose
        # edge sets change per batch (UltraQuery traversal dropout rebuilds)
        # keep one stable jit trace. Dead chunks extend the LAST output
        # block's run (weights 0), preserving the consecutive-revisit order.
        assert pad_chunks_to >= k, (pad_chunks_to, k)
        extra = pad_chunks_to - k
        if extra:
            last_rb = reduce_blk[-1] if k else np.int32(0)
            last_gb = gather_blk[-1] if k else np.int32(0)
            reduce_blk = np.concatenate([reduce_blk, np.full(extra, last_rb, np.int32)])
            gather_blk = np.concatenate([gather_blk, np.full(extra, last_gb, np.int32)])
            pad_rows = extra * chunk
            local_reduce = np.concatenate(
                [local_reduce, np.full(pad_rows, rb_reduce, np.int32)]
            )
            local_gather = np.concatenate([local_gather, np.zeros(pad_rows, np.int32)])
            types = np.concatenate([types, np.zeros(pad_rows, np.int32)])
            perm = np.concatenate([perm, np.full(pad_rows, dead_slot, np.int64)])
            total = pad_chunks_to * chunk
            k = pad_chunks_to

    r_pad = max(_round_up(num_relations, 8), 8)
    # blocks no chunk writes stay uninitialized in the pallas output and are
    # masked after the call (their true value is the aggregation identity)
    covered = np.zeros(n_red_blk, dtype=np.float32)
    if k:
        covered[np.unique(reduce_blk)] = 1.0
    # invert perm: edge id -> flat slot (ids with no slot -> virtual slot
    # `total`, which the weight-grad gather maps to 0)
    inv_slot = np.full(dead_slot + 1, total, dtype=np.int64)
    inv_slot[perm] = np.arange(total, dtype=np.int64)
    return PallasPlan(
        inv_slot=jnp.asarray(inv_slot.astype(np.int32)),
        reduce_blk=jnp.asarray(reduce_blk),
        gather_blk=jnp.asarray(gather_blk),
        local_reduce=jnp.asarray(local_reduce.reshape(k, chunk)),
        local_gather=jnp.asarray(local_gather.reshape(k, chunk)),
        types=jnp.asarray(types.reshape(k, chunk)),
        perm=jnp.asarray(perm.reshape(k, chunk).astype(np.int32)),
        covered=jnp.asarray(covered),
        num_chunks=k,
        chunk=chunk,
        rb_reduce=rb_reduce,
        rb_gather=rb_gather,
        n_reduce_pad=n_red_blk * rb_reduce,
        n_gather_pad=n_gat_blk * rb_gather,
        r_pad=r_pad,
    )


def _pad8(a: jax.Array) -> jax.Array:
    """Pad (K, C) chunk tables to K % 8 == 0 so (8, C) blocks tile."""
    k = a.shape[0]
    pad = (-k) % 8
    return jnp.pad(a, ((0, pad), (0, 0))) if pad else a


def _onehot(ids: jax.Array, width: int, dtype) -> jax.Array:
    """(C,) int32 -> (C, width) one-hot."""
    c = ids.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, width), 1)
    return (ids[:, None] == iota).astype(dtype)


def _fwd_kernel(mul_op, c, rbr, rbg, f_blk, acc_dtype, prec,
                reduce_blk_ref, gather_blk_ref,
                lred_ref, lgat_ref, types_ref, w_ref,
                x_ref, rel_ref, out_ref):
    """One chunk: gather -> message -> reduce, accumulating into out_ref."""
    k = pl.program_id(1)

    @pl.when((k == 0) | (reduce_blk_ref[k] != reduce_blk_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    row = jax.lax.rem(k, 8)
    lgat = lgat_ref[pl.ds(row, 1), :][0]
    lred = lred_ref[pl.ds(row, 1), :][0]
    types = types_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)

    g = _onehot(lgat, rbg, x_ref.dtype)
    xg = jnp.dot(g, x_ref[:], preferred_element_type=acc_dtype, precision=prec)  # (C, F)
    gt = _onehot(types, rel_ref.shape[0], rel_ref.dtype)
    relg = jnp.dot(gt, rel_ref[:], preferred_element_type=acc_dtype, precision=prec)  # (C, F)
    msg = xg * relg if mul_op == "mul" else xg + relg
    s = _onehot(lred, rbr, acc_dtype) * w[:, None]  # (C, RBr)
    out_ref[:] += jax.lax.dot_general(
        s, msg, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype, precision=prec,
    )


def rspmm_pallas_fwd(
    plan: PallasPlan,
    relation: jax.Array,  # (R, F) already flattened feature axis
    x: jax.Array,  # (N_gather, F)
    edge_weight_ext: jax.Array,  # (E_pad + 1,) with 0.0 in the last slot
    *,
    mul: str = "mul",
    f_block: int = 512,
    out_rows: Optional[int] = None,
    precision=None,
) -> jax.Array:
    """Sum-aggregation rspmm via the plan. Returns (n_reduce_pad, F)."""
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    if plan.num_chunks == 0:  # no live edges (e.g. fully masked graph)
        return jnp.zeros((rows, f), jnp.float32)
    f_blk = min(f_block, f)
    assert f % f_blk == 0, (f, f_blk)
    nf = f // f_blk

    x_pad = jnp.pad(x, ((0, plan.n_gather_pad - n), (0, 0)))
    rel_pad = jnp.pad(relation, ((0, plan.r_pad - relation.shape[0]), (0, 0)))
    w_plan = jnp.take(edge_weight_ext, plan.perm, axis=0)  # (K, C)

    k = plan.num_chunks
    c = plan.chunk
    grid = (nf, k)  # feature-major outer so output revisits stay consecutive

    kernel = functools.partial(
        _fwd_kernel, mul, c, plan.rb_reduce, plan.rb_gather, f_blk, jnp.float32,
        _prec(precision),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),  # local_reduce
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),  # local_gather
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),  # types
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),  # weights
                pl.BlockSpec(
                    (plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)
                ),  # x block
                pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),  # rel
            ],
            out_specs=pl.BlockSpec(
                (plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_reduce_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.reduce_blk, plan.gather_blk,
      _pad8(plan.local_reduce), _pad8(plan.local_gather),
      _pad8(plan.types), _pad8(w_plan),
      x_pad, rel_pad)

    # unvisited output blocks are uninitialized: their true sum is 0
    # (where, not multiply — 0 * garbage-inf would be NaN)
    mask = jnp.repeat(plan.covered, plan.rb_reduce)[:, None]
    out = jnp.where(mask > 0, out, 0.0)
    return out[:rows]


def _rel_grad_kernel(mul_op, c, rbx, rbg, acc_dtype, prec,
                     xblk_ref, gblk_ref,
                     ltype_ref, lx_ref, lg_ref, w_ref,
                     x_ref, g_ref, out_ref):
    """d_rel[type] += w * x[src] * g[dst] (mul) or w * g[dst] (add).

    Output is a single resident (r_pad, F) block accumulated over all chunks.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    row = jax.lax.rem(k, 8)
    ltype = ltype_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)

    gg = _onehot(lg_ref[pl.ds(row, 1), :][0], rbg, g_ref.dtype)
    g_rows = jnp.dot(gg, g_ref[:], preferred_element_type=acc_dtype, precision=prec)  # (C,F)
    if mul_op == "mul":
        gx = _onehot(lx_ref[pl.ds(row, 1), :][0], rbx, x_ref.dtype)
        x_rows = jnp.dot(gx, x_ref[:], preferred_element_type=acc_dtype, precision=prec)
        contrib = x_rows * g_rows
    else:
        contrib = g_rows
    s = _onehot(ltype, out_ref.shape[0], acc_dtype) * w[:, None]
    out_ref[:] += jax.lax.dot_general(
        s, contrib, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype, precision=prec,
    )


def rspmm_pallas_rel_grad(
    plan: PallasPlan,  # a reduce_side='dst' plan (tiles = (dst, src))
    x: jax.Array,  # (N, F)
    g: jax.Array,  # (N_reduce_pad-compatible, F) upstream cotangent by dst
    edge_weight_ext: jax.Array,
    num_relations: int,
    *,
    mul: str = "mul",
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """Returns (num_relations, F) gradient wrt the relation table."""
    n, f = x.shape
    f_blk = min(f_block, f)
    nf = f // f_blk
    x_pad = jnp.pad(x, ((0, plan.n_gather_pad - n), (0, 0)))
    g_pad = jnp.pad(g, ((0, plan.n_reduce_pad - g.shape[0]), (0, 0)))
    w_plan = jnp.take(edge_weight_ext, plan.perm, axis=0)

    k, c = plan.num_chunks, plan.chunk
    kernel = functools.partial(
        _rel_grad_kernel, mul, c, plan.rb_gather, plan.rb_reduce, jnp.float32,
        _prec(precision),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, xb, gb: (k // 8, 0)),  # types
                pl.BlockSpec((8, c), lambda j, k, xb, gb: (k // 8, 0)),  # local src (x)
                pl.BlockSpec((8, c), lambda j, k, xb, gb: (k // 8, 0)),  # local dst (g)
                pl.BlockSpec((8, c), lambda j, k, xb, gb: (k // 8, 0)),  # weights
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, xb, gb: (xb[k], j)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, xb, gb: (gb[k], j)),
            ],
            out_specs=pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, xb, gb: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.r_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.gather_blk, plan.reduce_blk,
      _pad8(plan.types), _pad8(plan.local_gather),
      _pad8(plan.local_reduce), _pad8(w_plan),
      x_pad, g_pad)
    return out[:num_relations]


def _dw_kernel(mul_op, minmax, c, rbr, rbg, acc_dtype, prec,
               reduce_blk_ref, gather_blk_ref,
               lred_ref, lgat_ref, types_ref, w_ref,
               x_ref, g_ref, out_fwd_ref, rel_ref, dw_ref):
    """Per-edge weight gradient d_w[e] = sum_f route * m * g[dst]
    (rspmm.cpp:106-114 weight_grad; rspmm.cu:141-147). ``m`` is the
    unweighted message; for min/max, route = [w*m == out[dst]] (ties all).

    Runs on the dst-major plan: gather side = src (x), reduce side = dst
    (g and, for min/max, the saved forward output). Output is per-SLOT
    (one scalar per chunk row), mapped back to edge order by inv_slot."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    lred = lred_ref[pl.ds(row, 1), :][0]
    lgat = lgat_ref[pl.ds(row, 1), :][0]
    types = types_ref[pl.ds(row, 1), :][0]

    x_sel = _onehot(lgat, rbg, x_ref.dtype)
    x_rows = jnp.dot(x_sel, x_ref[:], preferred_element_type=acc_dtype, precision=prec)
    gt = _onehot(types, rel_ref.shape[0], rel_ref.dtype)
    rel_rows = jnp.dot(gt, rel_ref[:], preferred_element_type=acc_dtype, precision=prec)
    m = x_rows * rel_rows if mul_op == "mul" else x_rows + rel_rows
    # sentinel lred rows (padding) produce all-zero g rows -> d_w 0
    g_sel = _onehot(lred, rbr, g_ref.dtype)
    g_rows = jnp.dot(g_sel, g_ref[:], preferred_element_type=acc_dtype, precision=prec)
    q = m * g_rows
    if minmax:
        w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)
        out_rows = jnp.dot(
            g_sel, out_fwd_ref[:], preferred_element_type=acc_dtype, precision=prec
        )
        live2 = w[:, None] != 0.0
        q = jnp.where((m * w[:, None] == out_rows) & live2, q, 0.0)
    dw_ref[pl.ds(row, 1), :] = jnp.sum(q, axis=1)[None, :]


def rspmm_pallas_dw(plan, relation, x, g, edge_weight, *, mul="mul",
                    out_fwd=None, f_block=512, precision=None):
    """(E,) weight gradient via the dst-major plan. ``out_fwd`` (saved
    forward output, finite-fill form) switches min/max tie routing on."""
    n, f = x.shape[0], int(np.prod(x.shape[1:]))
    f_blk = min(f_block, f)
    nf = f // f_blk
    k, c = plan.num_chunks, plan.chunk
    if k == 0:
        return jnp.zeros_like(edge_weight)
    x_gat = jnp.pad(_flatten(x), ((0, plan.n_gather_pad - n), (0, 0)))
    g2 = _flatten(g).astype(jnp.float32)
    g_red = jnp.pad(g2, ((0, plan.n_reduce_pad - g2.shape[0]), (0, 0)))
    rel_pad = jnp.pad(
        _flatten(relation), ((0, plan.r_pad - relation.shape[0]), (0, 0))
    )
    k_pad8 = _round_up(k, 8)
    minmax = out_fwd is not None
    if minmax:
        o2 = _flatten(out_fwd)
        out_red = jnp.pad(o2, ((0, plan.n_reduce_pad - o2.shape[0]), (0, 0)))
    else:
        out_red = g_red  # unused placeholder with the right block shape
    w_ext = jnp.concatenate([edge_weight, jnp.zeros((1,), edge_weight.dtype)])
    w_plan = jnp.take(w_ext, plan.perm, axis=0)

    kernel = functools.partial(
        _dw_kernel, mul, minmax, c, plan.rb_reduce, plan.rb_gather, jnp.float32,
        _prec(precision),
    )
    parts = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)),
                pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),
            ],
            # one (8, c) row-block per 8 consecutive chunks, per f-block —
            # row k%8 written at step k, blocks never revisited across j
            out_specs=pl.BlockSpec(
                (8, c), lambda j, k, rb, gb: (j * ((k_pad8) // 8) + k // 8, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nf * k_pad8, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.reduce_blk, plan.gather_blk,
      _pad8(plan.local_reduce), _pad8(plan.local_gather),
      _pad8(plan.types), _pad8(w_plan),
      x_gat, g_red, out_red, rel_pad)
    # rows K..k_pad8 of each f-section are unwritten garbage; real slots all
    # live below K*C, and ids with no slot map to the appended zero
    dw_flat = parts.reshape(nf, k_pad8 * c).sum(axis=0)
    dw_ext = jnp.concatenate([dw_flat, jnp.zeros((1,), jnp.float32)])
    e = edge_weight.shape[0]
    inv = plan.inv_slot[:e]
    idx = jnp.where(inv >= k * c, dw_flat.shape[0], inv)
    return jnp.take(dw_ext, idx, axis=0).astype(edge_weight.dtype)


_MINMAX_FILL = 1e38  # finite identity (matmul-safe; reference uses lowest/max)


def _minmax_kernel(mul_op, is_min, c, rbr, rbg, acc_dtype, prec,
                   reduce_blk_ref, gather_blk_ref,
                   lred_ref, lgat_ref, types_ref, w_ref,
                   x_ref, rel_ref, out_ref):
    """Segmented min/max per chunk: edges are sorted by local_reduce, so an
    in-chunk Hillis-Steele segmented scan leaves each segment's extremum on
    its last edge; a select-last one-hot matmul lands one value per output
    row, combined into out_ref with min/max. Identity is +/-1e38 (finite so
    0*identity stays 0 in the matmul), matching the reference's lowest/max
    init (operator.cuh:44-60)."""
    k = pl.program_id(1)
    fill = _MINMAX_FILL if is_min else -_MINMAX_FILL

    @pl.when((k == 0) | (reduce_blk_ref[k] != reduce_blk_ref[jnp.maximum(k - 1, 0)]))
    def _init():
        out_ref[:] = jnp.full_like(out_ref, fill)

    row = jax.lax.rem(k, 8)
    lgat = lgat_ref[pl.ds(row, 1), :][0]
    lred = lred_ref[pl.ds(row, 1), :][0]
    types = types_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)

    g = _onehot(lgat, rbg, x_ref.dtype)
    xg = jnp.dot(g, x_ref[:], preferred_element_type=acc_dtype, precision=prec)
    gt = _onehot(types, rel_ref.shape[0], rel_ref.dtype)
    relg = jnp.dot(gt, rel_ref[:], preferred_element_type=acc_dtype, precision=prec)
    msg = xg * relg if mul_op == "mul" else xg + relg
    msg = msg * w[:, None]
    # NOTE: all masks stay 2D — Mosaic cannot reshape 1-bit (bool) vectors
    live2 = w[:, None] != 0.0  # (C, 1)
    msg = jnp.where(live2, msg, fill)

    # segmented scan: combine with previous positions of the same segment
    comb = jnp.minimum if is_min else jnp.maximum
    lred2 = lred[:, None]
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    shift = 1
    while shift < c:
        rolled = pltpu.roll(msg, shift, 0)
        lred_rolled2 = pltpu.roll(lred2, shift, 0)
        same2 = (idx2 >= shift) & (lred_rolled2 == lred2)
        msg = comb(msg, jnp.where(same2, rolled, fill))
        shift *= 2

    # last edge position of each segment (liveness-independent: the scan
    # already neutralized masked edges, and an all-masked segment's fill
    # value is a no-op under the final min/max combine)
    lred_next2 = pltpu.roll(lred2, c - 1, 0)  # roll(-1) == roll(c-1)
    is_last2 = (lred_next2 != lred2) | (idx2 == c - 1)  # (C, 1)
    is_last_f = jnp.where(is_last2, 1.0, 0.0).astype(acc_dtype)
    sel = _onehot(lred, rbr, acc_dtype) * is_last_f
    cand = jax.lax.dot_general(
        sel, jnp.where(is_last2, msg, 0.0),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype, precision=prec,
    )  # (RBr, F); rows without contribution are 0
    has = jax.lax.dot_general(
        sel, jnp.ones((c, 1), acc_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )  # (RBr, 1)
    out_ref[:] = jnp.where(has > 0, comb(out_ref[:], cand), out_ref[:])


def rspmm_pallas_minmax_fwd(
    plan: PallasPlan,
    relation: jax.Array,  # (R, F)
    x: jax.Array,  # (N, F)
    edge_weight_ext: jax.Array,
    *,
    mul: str = "mul",
    is_min: bool = False,
    f_block: int = 512,
    out_rows: Optional[int] = None,
    precision=None,
) -> jax.Array:
    """min/max-aggregation rspmm (forward only). Rows with no live edges hold
    -/+1e38 (callers fold the boundary with max/min, layers.py:205-219)."""
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    if plan.num_chunks == 0:  # no live edges
        fill = jnp.inf if is_min else -jnp.inf
        return jnp.full((rows, f), fill, jnp.float32)
    f_blk = min(f_block, f)
    nf = f // f_blk
    x_pad = jnp.pad(x, ((0, plan.n_gather_pad - n), (0, 0)))
    rel_pad = jnp.pad(relation, ((0, plan.r_pad - relation.shape[0]), (0, 0)))
    w_plan = jnp.take(edge_weight_ext, plan.perm, axis=0)
    k, c = plan.num_chunks, plan.chunk

    kernel = functools.partial(
        _minmax_kernel, mul, is_min, c, plan.rb_reduce, plan.rb_gather, jnp.float32,
        _prec(precision),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)),
                pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),
            ],
            out_specs=pl.BlockSpec(
                (plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_reduce_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.reduce_blk, plan.gather_blk,
      _pad8(plan.local_reduce), _pad8(plan.local_gather),
      _pad8(plan.types), _pad8(w_plan),
      x_pad, rel_pad)
    # unvisited output blocks are uninitialized: force them to the identity,
    # then convert the finite fill back to the XLA path's +/-inf convention
    sign = 1.0 if is_min else -1.0
    mask = jnp.repeat(plan.covered, plan.rb_reduce)[:, None]
    out = jnp.where(mask > 0, out, sign * _MINMAX_FILL)
    outv = out[:rows]
    return jnp.where(outv == sign * _MINMAX_FILL, sign * jnp.inf, outv)


def _minmax_dx_kernel(mul_op, c, rbr, rbg, acc_dtype, prec,
                      reduce_blk_ref, gather_blk_ref,
                      lred_ref, lgat_ref, types_ref, w_ref,
                      xred_ref, g_ref, out_ref_in, rel_ref, dx_ref):
    """d_x[src] += [w*m == out[dst]] * w * dBinary/dx * g[dst].

    Runs on the src-major plan: reduce side = src (output rows of dx),
    gather side = dst (g and the saved forward output)."""
    k = pl.program_id(1)

    @pl.when((k == 0) | (reduce_blk_ref[k] != reduce_blk_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    row = jax.lax.rem(k, 8)
    lred = lred_ref[pl.ds(row, 1), :][0]   # local src ids
    lgat = lgat_ref[pl.ds(row, 1), :][0]   # local dst ids
    types = types_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)

    g_sel = _onehot(lgat, rbg, g_ref.dtype)
    g_rows = jnp.dot(g_sel, g_ref[:], preferred_element_type=acc_dtype, precision=prec)
    out_rows = jnp.dot(g_sel, out_ref_in[:], preferred_element_type=acc_dtype, precision=prec)
    x_sel = _onehot(lred, rbr, xred_ref.dtype)
    x_rows = jnp.dot(x_sel, xred_ref[:], preferred_element_type=acc_dtype, precision=prec)
    gt = _onehot(types, rel_ref.shape[0], rel_ref.dtype)
    rel_rows = jnp.dot(gt, rel_ref[:], preferred_element_type=acc_dtype, precision=prec)

    m = x_rows * rel_rows if mul_op == "mul" else x_rows + rel_rows
    live2 = w[:, None] != 0.0
    route = jnp.where((m * w[:, None] == out_rows) & live2, 1.0, 0.0)
    contrib = route * w[:, None] * g_rows
    if mul_op == "mul":
        contrib = contrib * rel_rows
    s = _onehot(lred, rbr, acc_dtype)
    dx_ref[:] += jax.lax.dot_general(
        s, contrib, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype, precision=prec,
    )


def _minmax_drel_kernel(mul_op, c, rbr, rbg, acc_dtype, prec,
                        reduce_blk_ref, gather_blk_ref,
                        lred_ref, lgat_ref, types_ref, w_ref,
                        xgat_ref, g_ref, out_ref_in, rel_ref, drel_ref):
    """d_rel[type] += [w*m == out[dst]] * w * dBinary/drel * g[dst].

    Runs on the dst-major plan: reduce side = dst (g/out gathered by it),
    gather side = src (x); output is the resident (r_pad, F) block."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        drel_ref[:] = jnp.zeros_like(drel_ref)

    row = jax.lax.rem(k, 8)
    lred = lred_ref[pl.ds(row, 1), :][0]   # local dst ids
    lgat = lgat_ref[pl.ds(row, 1), :][0]   # local src ids
    types = types_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0].astype(acc_dtype)

    d_sel = _onehot(lred, rbr, g_ref.dtype)
    g_rows = jnp.dot(d_sel, g_ref[:], preferred_element_type=acc_dtype, precision=prec)
    out_rows = jnp.dot(d_sel, out_ref_in[:], preferred_element_type=acc_dtype, precision=prec)
    x_sel = _onehot(lgat, rbg, xgat_ref.dtype)
    x_rows = jnp.dot(x_sel, xgat_ref[:], preferred_element_type=acc_dtype, precision=prec)
    gt = _onehot(types, rel_ref.shape[0], rel_ref.dtype)
    rel_rows = jnp.dot(gt, rel_ref[:], preferred_element_type=acc_dtype, precision=prec)

    m = x_rows * rel_rows if mul_op == "mul" else x_rows + rel_rows
    live2 = w[:, None] != 0.0
    route = jnp.where((m * w[:, None] == out_rows) & live2, 1.0, 0.0)
    contrib = route * w[:, None] * g_rows
    if mul_op == "mul":
        contrib = contrib * x_rows
    drel_ref[:] += jax.lax.dot_general(
        gt.astype(acc_dtype), contrib,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype, precision=prec,
    )


def _minmax_bwd_call(kernel_fn, plan, x_side, g, out_fwd, rel, w_plan,
                     out_rows_padded, out_rows, f, f_blk, resident_out=False,
                     r_pad=None):
    """Shared pallas_call plumbing for the two min/max backward kernels."""
    nf = f // f_blk
    k, c = plan.num_chunks, plan.chunk
    if resident_out:
        out_spec = pl.BlockSpec((r_pad, f_blk), lambda j, k, rb, gb: (0, j))
        out_shape = jax.ShapeDtypeStruct((r_pad, f), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)
        )
        out_shape = jax.ShapeDtypeStruct((plan.n_reduce_pad, f), jnp.float32)
    out = pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)),
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)),
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)),
                pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),
            ],
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.reduce_blk, plan.gather_blk,
      _pad8(plan.local_reduce), _pad8(plan.local_gather),
      _pad8(plan.types), _pad8(w_plan),
      x_side, g, out_fwd, rel)
    return out


def rspmm_pallas_minmax(plans, relation, x, edge_weight, mul: str, sum_op: str,
                        num_nodes: int, precision=None):
    """(V, B, D) min/max rspmm with tie-routed custom VJP
    (operator.cuh:62-77 semantics: every tying edge receives the gradient).
    ``precision``: None (fast bf16-pass MXU) or 'highest' (exact f32); the
    same setting flows to the backward kernels so tie routing stays
    consistent with the forward."""
    return _minmax_vjp(mul, sum_op, num_nodes, _prec(precision),
                       plans, relation, x, edge_weight)


def _minmax_v2_eligible(plans, f: int) -> bool:
    """The v2 min/max kernels serve both the primal and the VJP when both
    traversal orders carry sort_slots=False gather+fold plans and the
    feature axis is inside the empirical width gate."""
    return (
        plans.v2 is not None and not plans.v2.sorted_slots
        and plans.v2src is not None and not plans.v2src.sorted_slots
        and f <= V2_MAX_F
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _minmax_vjp(mul, sum_op, num_nodes, prec, plans, relation, x, edge_weight):
    shape = x.shape
    w_ext = jnp.concatenate([edge_weight, jnp.zeros((1,), edge_weight.dtype)])
    if _minmax_v2_eligible(plans, int(np.prod(shape[1:]))):
        from ultra_tpu.ops.rspmm_pallas_v2 import rspmm_v2_minmax

        out = rspmm_v2_minmax(
            plans.v2, _flatten(relation), _flatten(x), w_ext,
            mul=mul, is_min=(sum_op == "min"), out_rows=num_nodes,
            precision=prec,
        )
    else:
        out = rspmm_pallas_minmax_fwd(
            plans.dst, _flatten(relation), _flatten(x), w_ext,
            mul=mul, is_min=(sum_op == "min"), out_rows=num_nodes,
            precision=prec,
        )
    return out.reshape((num_nodes,) + shape[1:])


def _minmax_vjp_fwd(mul, sum_op, num_nodes, prec, plans, relation, x, edge_weight):
    # the forward under differentiation runs the SAME kernel generation the
    # backward will route against (w*m == out only holds bit-exactly within
    # one generation's matmul sequence): v2 primal + v2 backward when
    # eligible, the v1 pair otherwise.
    out = _minmax_vjp(mul, sum_op, num_nodes, prec, plans, relation, x, edge_weight)
    return out, (plans, relation, x, edge_weight, out)


def _minmax_vjp_bwd(mul, sum_op, num_nodes, prec, res, g):
    plans, relation, x, edge_weight, out_fwd = res
    if plans.dst.num_chunks == 0:
        return (None, jnp.zeros_like(relation), jnp.zeros_like(x), None)
    f = int(np.prod(x.shape[1:]))
    f_blk = min(512, f)
    w_ext = jnp.concatenate([edge_weight, jnp.zeros((1,), edge_weight.dtype)])
    g2 = _flatten(g).astype(jnp.float32)
    # the saved output holds +/-inf on empty rows; restore the finite fill so
    # the equality routing (m * w == out) never sees inf inside the kernel
    sign = 1.0 if sum_op == "min" else -1.0
    out2 = _flatten(out_fwd)
    out2 = jnp.where(jnp.isinf(out2), sign * _MINMAX_FILL, out2)

    if _minmax_v2_eligible(plans, f):
        from ultra_tpu.ops.rspmm_pallas_v2 import (
            rspmm_v2_minmax_drel, rspmm_v2_minmax_dx,
        )

        d_x = rspmm_v2_minmax_dx(
            plans.v2src, _flatten(relation), g2, out2, _flatten(x), w_ext,
            mul=mul, out_rows=x.shape[0], precision=prec,
        ).reshape(x.shape)
        d_rel = rspmm_v2_minmax_drel(
            plans.v2, _flatten(x), g2, out2, w_ext, relation.shape[0],
            _flatten(relation), mul=mul, precision=prec,
        ).reshape(relation.shape)
        d_w = None
        if plans.dst.inv_slot is not None:
            # per-edge weight grad stays on the v1 kernel (per-slot scalar
            # output layout); exact under interpret/'highest', and pruned by
            # XLA in every shipped config (weights are masks, not params)
            d_w = rspmm_pallas_dw(
                plans.dst, relation, x, g, edge_weight, mul=mul, out_fwd=out2,
                precision=prec,
            )
        return (None, d_rel.astype(relation.dtype), d_x.astype(x.dtype), d_w)

    # d_x on the src-major plan
    p = plans.src
    x_red = jnp.pad(_flatten(x), ((0, p.n_reduce_pad - x.shape[0]), (0, 0)))
    g_gat = jnp.pad(g2, ((0, p.n_gather_pad - g2.shape[0]), (0, 0)))
    out_gat = jnp.pad(out2, ((0, p.n_gather_pad - out2.shape[0]), (0, 0)))
    rel_pad = jnp.pad(
        _flatten(relation), ((0, p.r_pad - relation.shape[0]), (0, 0))
    )
    w_plan = jnp.take(w_ext, p.perm, axis=0)
    kern = functools.partial(
        _minmax_dx_kernel, mul, p.chunk, p.rb_reduce, p.rb_gather, jnp.float32, prec
    )
    d_x = _minmax_bwd_call(
        kern, p, x_red, g_gat, out_gat, rel_pad, w_plan,
        p.n_reduce_pad, x.shape[0], f, f_blk,
    )
    # unvisited output blocks (nodes with no outgoing edges in this plan)
    # are uninitialized; their true gradient is 0
    d_x = jnp.where(jnp.repeat(p.covered, p.rb_reduce)[:, None] > 0, d_x, 0.0)
    d_x = d_x[: x.shape[0]].reshape(x.shape)

    # d_rel on the dst-major plan (resident relation-sized output)
    p = plans.dst
    x_gat = jnp.pad(_flatten(x), ((0, p.n_gather_pad - x.shape[0]), (0, 0)))
    g_red = jnp.pad(g2, ((0, p.n_reduce_pad - g2.shape[0]), (0, 0)))
    out_red = jnp.pad(out2, ((0, p.n_reduce_pad - out2.shape[0]), (0, 0)))
    rel_pad = jnp.pad(
        _flatten(relation), ((0, p.r_pad - relation.shape[0]), (0, 0))
    )
    w_plan = jnp.take(w_ext, p.perm, axis=0)
    kern = functools.partial(
        _minmax_drel_kernel, mul, p.chunk, p.rb_reduce, p.rb_gather, jnp.float32, prec
    )

    # drel kernel gathers g/out by the REDUCE side: reuse the gather specs by
    # passing (x by gather side) and (g, out by reduce side) in the right slots
    d_rel = _drel_call(kern, p, x_gat, g_red, out_red, rel_pad, w_plan, f, f_blk)
    d_rel = d_rel[: relation.shape[0]].reshape(relation.shape)
    d_w = None
    if p.inv_slot is not None:
        d_w = rspmm_pallas_dw(
            p, relation, x, g, edge_weight, mul=mul, out_fwd=out2,
            precision=prec,
        )
    return (None, d_rel.astype(relation.dtype), d_x.astype(x.dtype), d_w)


def _drel_call(kernel_fn, plan, x_gat, g_red, out_red, rel, w_plan, f, f_blk):
    nf = f // f_blk
    k, c = plan.num_chunks, plan.chunk
    return pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((8, c), lambda j, k, rb, gb: (k // 8, 0)),
                pl.BlockSpec((plan.rb_gather, f_blk), lambda j, k, rb, gb: (gb[k], j)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)),
                pl.BlockSpec((plan.rb_reduce, f_blk), lambda j, k, rb, gb: (rb[k], j)),
                pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),
            ],
            out_specs=pl.BlockSpec((plan.r_pad, f_blk), lambda j, k, rb, gb: (0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.r_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.reduce_blk, plan.gather_blk,
      _pad8(plan.local_reduce), _pad8(plan.local_gather),
      _pad8(plan.types), _pad8(w_plan),
      x_gat, g_red, out_red, rel)


_minmax_vjp.defvjp(_minmax_vjp_fwd, _minmax_vjp_bwd)


# ---------------------------------------------------------------------------
# High-level wrapper with custom VJP, (V, B, D)-shaped operands
# ---------------------------------------------------------------------------


@struct.dataclass
class GraphPlans:
    """Both traversal orders for a graph (built once on host).

    ``num_shards > 0`` marks the edge-sharded variant: every plan array has
    an extra leading shard axis (sharded over the mesh 'edge' axis by
    parallel.mesh.graph_pspec); inside shard_map each device sees its own
    plain per-shard plan. The edge-weight vector stays replicated so the
    global permutation indices remain valid on every shard."""

    dst: PallasPlan  # reduce over dst (forward, rel-grad)
    src: PallasPlan  # reduce over src (input-grad)
    num_shards: int = struct.field(pytree_node=False, default=0)
    # optional v2 (gather+fold) plans — see rspmm_pallas_v2.py; the sum
    # primal uses ``v2`` and its input-grad uses ``v2src`` (the same
    # computation with src/dst roles swapped) when present; rel-grad and
    # min/max keep the v1 kernels
    v2: Optional[object] = None
    v2src: Optional[object] = None
    # optional w3 (windowed in-kernel gather) plans — rspmm_pallas_w3.py;
    # preferred over v2 for the sum primal/d_x when present (attach via
    # attach_plans(w3=True) or ULTRA_W3=1 — probe-gated, see that module)
    w3: Optional[object] = None
    w3src: Optional[object] = None
    # optional v2 rel-gather plans (PlanV2 with rel_gather=True): the fused
    # kernel fetches relation rows by the same-shape in-kernel gather
    # instead of the tw-wide one-hot select — sum fwd/d_x only (the
    # rel-grad keeps the clustered ``v2`` plan, whose OUTPUT is the table).
    # Probe-gated via ULTRA_V2_RELGATHER=1; mainly a uniform-histogram win.
    v2rg: Optional[object] = None
    v2rgsrc: Optional[object] = None

    @classmethod
    def build(
        cls, edge_index, edge_type, num_nodes, num_relations,
        rb: int = 384, chunk: int = 128,
        edge_ids=None, dead_slot=None, pad_chunks_to=None,
    ) -> "GraphPlans":
        kw = dict(
            rb_reduce=rb, rb_gather=rb, chunk=chunk,
            edge_ids=edge_ids, dead_slot=dead_slot, pad_chunks_to=pad_chunks_to,
        )
        return cls(
            dst=build_plan(
                edge_index, edge_type, num_nodes, num_relations,
                reduce_side="dst", **kw,
            ),
            src=build_plan(
                edge_index, edge_type, num_nodes, num_relations,
                reduce_side="src", **kw,
            ),
        )


def build_sharded_plans(
    graph, n_shards: int, rb: Optional[int] = None, chunk: int = 128, host_edges=None
):
    """Edge-partition a graph's live edges into ``n_shards`` contiguous
    groups and build a stacked GraphPlans (leading shard axis, common chunk
    count). Each shard computes rspmm partials over its own edges; a psum
    over the mesh edge axis combines them (models/layers.py _combine).

    The scaling design of SURVEY.md §2.8: boundary-node partials ride ICI,
    the graph no longer needs to fit one chip's working set.
    """
    if host_edges is not None:
        ei, et, ew = (np.asarray(a) for a in host_edges)
    else:
        ei = np.asarray(jax.device_get(graph.edge_index))
        et = np.asarray(jax.device_get(graph.edge_type))
        ew = np.asarray(jax.device_get(graph.edge_weight))
    live = np.nonzero(ew != 0.0)[0]
    if rb is None:
        rb = auto_rb(graph.num_nodes, len(live) // max(n_shards, 1),
                     graph.num_relations, chunk)
    groups = np.array_split(live, n_shards)

    per_shard = [
        GraphPlans.build(
            ei[:, g], et[g], graph.num_nodes, graph.num_relations,
            rb=rb, chunk=chunk, edge_ids=g, dead_slot=graph.num_edges_padded,
        )
        for g in groups
    ]
    k_dst = max(p.dst.num_chunks for p in per_shard)
    k_src = max(p.src.num_chunks for p in per_shard)
    dead = graph.num_edges_padded
    per_shard = [
        p.replace(dst=pad_plan(p.dst, k_dst, dead), src=pad_plan(p.src, k_src, dead))
        for p in per_shard
    ]

    # v2 (gather+fold) plans per shard, padded to common static shapes so
    # the stack has one leading shard axis (pad groups are masked/zeroed —
    # see pad_plan_v2). Shards whose type clustering lands on different
    # table widths rebuild unclustered so ``tw`` matches everywhere.
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    def build_v2(gids, cluster=True, swap=False, tw=128):
        e = ei[::-1] if swap else ei
        return v2mod.build_plan_v2(
            e[:, gids], et[gids], graph.num_nodes, graph.num_relations,
            chunk=1024, edge_ids=gids, dead_slot=dead,
            cluster=cluster, sort_slots=False, tw=tw,
        )

    r_pad_v2 = max(_round_up(graph.num_relations, 8), 8)
    for swap, attr in ((False, "v2"), (True, "v2src")):
        plans2 = [build_v2(g, swap=swap) for g in groups]
        tws = {p.tw for p in plans2}
        if len(tws) > 1 and max(tws) < r_pad_v2:
            # shards escalated to different feasibility floors: the max
            # width clusters on every shard (each shard's floor <= it)
            plans2 = [build_v2(g, swap=swap, tw=max(tws)) for g in groups]
            tws = {p.tw for p in plans2}
            # the explicit width bypasses _group_tables' auto-escalation
            # acceptance gate — re-apply it per shard (table DMA must stay
            # cheap vs the edge stream; the 0.12-0.5 regime measured ~13%
            # slower than the global table, output/r4 uniform_tw3 vs
            # bench_autotw). Any shard over budget -> unclustered everywhere.
            from ultra_tpu.ops.rspmm_pallas_v2 import TW_ACCEPT

            if any(p.tw < r_pad_v2
                   and p.n_groups * p.tw > TW_ACCEPT * p.e_pad
                   for p in plans2):
                tws = {-1}  # force the unclustered rebuild below
        if len(tws) > 1:
            plans2 = [build_v2(g, cluster=False, swap=swap) for g in groups]
        e_pad_t = max(p.e_pad for p in plans2)
        ng_t = max(p.n_groups for p in plans2)
        nc_t = max(p.n_compact_pad for p in plans2)
        plans2 = [
            v2mod.pad_plan_v2(p, e_pad_t, ng_t, nc_t, dead) for p in plans2
        ]
        per_shard = [
            gp.replace(**{attr: p2}) for gp, p2 in zip(per_shard, plans2)
        ]

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_shard)
    stacked = stacked.replace(num_shards=n_shards)
    return graph.replace(plans=stacked)


def pad_plan(plan: PallasPlan, k_target: int, dead_slot: int) -> PallasPlan:
    """Append all-dead chunks (weights 0, sentinel reduce ids) up to
    ``k_target`` — see build_plan's pad_chunks_to."""
    k = plan.num_chunks
    assert k_target >= k, (k_target, k)
    if k_target == k:
        return plan
    extra = k_target - k
    c = plan.chunk
    last_rb = plan.reduce_blk[-1] if k else jnp.int32(0)
    last_gb = plan.gather_blk[-1] if k else jnp.int32(0)
    return plan.replace(
        reduce_blk=jnp.concatenate(
            [plan.reduce_blk, jnp.full((extra,), last_rb, jnp.int32)]
        ),
        gather_blk=jnp.concatenate(
            [plan.gather_blk, jnp.full((extra,), last_gb, jnp.int32)]
        ),
        local_reduce=jnp.concatenate(
            [plan.local_reduce, jnp.full((extra, c), plan.rb_reduce, jnp.int32)]
        ),
        local_gather=jnp.concatenate(
            [plan.local_gather, jnp.zeros((extra, c), jnp.int32)]
        ),
        types=jnp.concatenate([plan.types, jnp.zeros((extra, c), jnp.int32)]),
        perm=jnp.concatenate(
            [plan.perm, jnp.full((extra, c), dead_slot, jnp.int32)]
        ),
        num_chunks=k_target,
    )  # covered unchanged: dead chunks extend an already-covered block


def attach_plans(graph, rb: Optional[int] = None, chunk: int = 128, host_edges=None,
                 pad_chunks_to=None, v2: bool = True, v2_chunk: int = 1024,
                 w3: Optional[bool] = None, w3_window: int = 1024,
                 v2_sort_slots: bool = False):
    """Build GraphPlans from a Graph's live edges and attach them.

    The plan permutation indexes the graph's full padded edge-weight vector
    (dead slot = E_pad, the extra zero appended at call time), so runtime
    masks (easy-edge dropout) flow through with no plan rebuild.

    ``host_edges``: optional (edge_index, edge_type, edge_weight) numpy
    arrays of the PADDED graph — avoids a device->host transfer when the
    caller still holds them (device_get over a tunneled TPU is slow).

    ``v2``: also build the gather+fold forward plan (rspmm_pallas_v2) used
    by the sum primal. Skipped when ``pad_chunks_to`` is set (plans whose
    chunk count must stay jit-stable across edge-set changes — UltraQuery
    traversal dropout — keep the v1-only path). ``v2_chunk`` defaults to
    1024 — the on-chip sweep winner (c=128 pays ~2x in sequential grid
    steps; c=2048 loses to ALIGN pad waste).
    """
    if host_edges is not None:
        ei, et, ew = (np.asarray(a) for a in host_edges)
    else:
        ei = np.asarray(jax.device_get(graph.edge_index))
        et = np.asarray(jax.device_get(graph.edge_type))
        ew = np.asarray(jax.device_get(graph.edge_weight))
    live = np.nonzero(ew != 0.0)[0]
    if rb is None:
        rb = auto_rb(graph.num_nodes, len(live), graph.num_relations, chunk,
                     edge_index=ei[:, live])
    plans = GraphPlans.build(
        ei[:, live], et[live], graph.num_nodes, graph.num_relations,
        rb=rb, chunk=chunk,
        edge_ids=live, dead_slot=graph.num_edges_padded,
        pad_chunks_to=pad_chunks_to,
    )
    if v2 and pad_chunks_to is None and len(live):
        from ultra_tpu.ops.rspmm_pallas_v2 import build_plan_v2

        # sort_slots=False keeps each dst's edges contiguous so the same
        # plan serves the sum AND min/max kernels; at the default chunk
        # (1024) slot sorting does not change the table stats on CLUSTERED
        # (zipf/schema) graphs. ``v2_sort_slots=True`` is for sum/mean-only
        # models (the flagship ultra_3g config): min-type slot sorting
        # within blocks lowers the per-chunk distinct-type floor so the
        # planner's auto-width escalation can beat the global table on
        # uniform relation histograms (+15% fwd, output/r4/uniform_tw3.log);
        # min/max ops on such a plan safely fall back to the v1 kernel
        # (_minmax_v2_eligible checks sorted_slots).
        plan2 = build_plan_v2(
            ei[:, live], et[live], graph.num_nodes, graph.num_relations,
            chunk=v2_chunk, edge_ids=live, dead_slot=graph.num_edges_padded,
            sort_slots=v2_sort_slots,
        )
        plan2s = build_plan_v2(
            ei[::-1][:, live], et[live], graph.num_nodes, graph.num_relations,
            chunk=v2_chunk, edge_ids=live, dead_slot=graph.num_edges_padded,
            sort_slots=v2_sort_slots,
        )
        plans = plans.replace(v2=plan2, v2src=plan2s)
        import os as _osmod

        r_pad_graph = max(_round_up(graph.num_relations, 8), 8)
        if (_osmod.environ.get("ULTRA_V2_RELGATHER", "") == "1"
                and r_pad_graph <= v2_chunk):
            plan2rg = build_plan_v2(
                ei[:, live], et[live], graph.num_nodes, graph.num_relations,
                chunk=v2_chunk, edge_ids=live,
                dead_slot=graph.num_edges_padded, sort_slots=False,
                rel_gather=True,
            )
            plan2rgs = build_plan_v2(
                ei[::-1][:, live], et[live], graph.num_nodes,
                graph.num_relations, chunk=v2_chunk, edge_ids=live,
                dead_slot=graph.num_edges_padded, sort_slots=False,
                rel_gather=True,
            )
            plans = plans.replace(v2rg=plan2rg, v2rgsrc=plan2rgs)
    if w3 is None:
        import os

        w3 = os.environ.get("ULTRA_W3", "") == "1"
    if w3 and pad_chunks_to is None and len(live):
        from ultra_tpu.ops.rspmm_pallas_w3 import build_plan_w3

        plan3 = build_plan_w3(
            ei[:, live], et[live], graph.num_nodes, graph.num_relations,
            window=w3_window, edge_ids=live, dead_slot=graph.num_edges_padded,
        )
        plan3s = build_plan_w3(
            ei[::-1][:, live], et[live], graph.num_nodes, graph.num_relations,
            window=w3_window, edge_ids=live, dead_slot=graph.num_edges_padded,
        )
        # cell-padding gate: w3's (dst block x window) cells only pay off
        # when edges/cell is high (dense or small-V graphs); on large sparse
        # graphs (120K nodes / 2M edges -> ~54 edges per 1024-slot cell) the
        # padding dwarfs the stream saving and v2 stays the right kernel
        max_waste = 2.5
        if (plan3.e_pad <= max_waste * len(live)
                and plan3s.e_pad <= max_waste * len(live)):
            plans = plans.replace(w3=plan3, w3src=plan3s)
    return graph.replace(plans=plans)


def _flatten(a):  # (N, B, D) -> (N, B*D)
    return a.reshape(a.shape[0], -1)


def _sum_impl(mul, num_nodes, precision, plans, relation, x, edge_weight,
              int8_ok=True):
    shape = x.shape
    w_ext = jnp.concatenate([edge_weight, jnp.zeros((1,), edge_weight.dtype)])
    f = int(np.prod(shape[1:]))
    if plans.w3 is not None and f <= V2_MAX_F:
        from ultra_tpu.ops.rspmm_pallas_w3 import rspmm_w3_fwd

        out = rspmm_w3_fwd(
            plans.w3, _flatten(relation), _flatten(x), w_ext, mul=mul,
            out_rows=num_nodes, precision=precision,
        )
    elif (plans.v2rg is not None or plans.v2 is not None) and f <= V2_MAX_F:
        from ultra_tpu.ops.rspmm_pallas_v2 import rspmm_v2_fwd

        out = rspmm_v2_fwd(
            plans.v2rg if plans.v2rg is not None else plans.v2,
            _flatten(relation), _flatten(x), w_ext, mul=mul,
            out_rows=num_nodes, precision=precision, int8_ok=int8_ok,
        )
    else:
        out = rspmm_pallas_fwd(
            plans.dst, _flatten(relation), _flatten(x), w_ext, mul=mul,
            out_rows=num_nodes, precision=precision,
        )
    return out.reshape((num_nodes,) + shape[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rspmm_pallas_sum(mul: str, num_nodes: int, precision, plans: GraphPlans,
                     relation, x, edge_weight):
    """out[dst] = sum_e w_e * op(rel[type_e], x[src_e]); shapes (V, B, D).
    ``precision``: None (fast bf16-pass MXU) or 'highest' (exact f32),
    applied to forward and both gradient kernels."""
    return _sum_impl(mul, num_nodes, precision, plans, relation, x, edge_weight)


def _fwd(mul, num_nodes, precision, plans, relation, x, edge_weight):
    # int8_ok=False: under differentiation the STREAM_INT8 eval-only probe
    # must not quantize the primal either — fwd/bwd stay consistent even if
    # the env flag is set in a training process.
    out = _sum_impl(mul, num_nodes, precision, plans, relation, x, edge_weight,
                    int8_ok=False)
    return out, (plans, relation, x, edge_weight)


def _bwd(mul, num_nodes, precision, res, g):
    plans, relation, x, edge_weight = res
    if plans.dst.num_chunks == 0:
        return (None, jnp.zeros_like(relation), jnp.zeros_like(x), None)
    shape = x.shape
    w_ext = jnp.concatenate([edge_weight, jnp.zeros((1,), edge_weight.dtype)])
    g2 = _flatten(g)
    # d_x[src] = sum_e w * rel[type] * g[dst]  (mul) | sum_e w * g[dst] (add)
    # — the forward with src/dst roles swapped, so the v2 gather+fold plan
    # applies directly
    rel_or_ones = (
        _flatten(relation) if mul == "mul" else jnp.ones_like(_flatten(relation))
    )
    f = int(np.prod(shape[1:]))
    if plans.w3src is not None and f <= V2_MAX_F:
        from ultra_tpu.ops.rspmm_pallas_w3 import rspmm_w3_fwd

        d_x = rspmm_w3_fwd(
            plans.w3src, rel_or_ones, g2, w_ext, mul="mul",
            out_rows=x.shape[0], precision=precision,
        ).reshape(shape)
    elif (plans.v2rgsrc is not None or plans.v2src is not None) and f <= V2_MAX_F:
        from ultra_tpu.ops.rspmm_pallas_v2 import rspmm_v2_fwd

        d_x = rspmm_v2_fwd(
            plans.v2rgsrc if plans.v2rgsrc is not None else plans.v2src,
            rel_or_ones, g2, w_ext, mul="mul",
            out_rows=x.shape[0], precision=precision,
            int8_ok=False,  # never quantize gradient streams (eval-only probe)
        ).reshape(shape)
    else:
        d_x = rspmm_pallas_fwd(
            plans.src,
            rel_or_ones,
            g2,
            w_ext,
            mul="mul",
            out_rows=x.shape[0],
            precision=precision,
        ).reshape(shape)
    # d_rel[type] = sum_e w * x[src] * g[dst]  (mul) | sum_e w * g[dst] (add)
    if plans.v2 is not None and f <= V2_MAX_F:
        from ultra_tpu.ops.rspmm_pallas_v2 import rspmm_v2_drel, rspmm_v2_drel_add

        if mul == "mul":
            d_rel = rspmm_v2_drel(
                plans.v2, _flatten(x), g2, w_ext, relation.shape[0],
                precision=precision,
            ).reshape(relation.shape)
        else:  # transe: no x stream at all (d message / d rel = 1)
            d_rel = rspmm_v2_drel_add(
                plans.v2, g2, w_ext, relation.shape[0], precision=precision,
            ).reshape(relation.shape)
    else:
        d_rel = rspmm_pallas_rel_grad(
            plans.dst, _flatten(x), g2, w_ext, relation.shape[0], mul=mul,
            precision=precision,
        ).reshape(relation.shape)
    # d_w[e] = sum_f m * g[dst] (XLA prunes this kernel when w isn't
    # differentiated downstream)
    d_w = None
    if plans.dst.inv_slot is not None:
        d_w = rspmm_pallas_dw(
            plans.dst, relation, x, g, edge_weight, mul=mul, precision=precision
        )
    # match primal dtypes (bf16 compute mode feeds bf16 operands)
    return (None, d_rel.astype(relation.dtype), d_x.astype(x.dtype), d_w)


rspmm_pallas_sum.defvjp(_fwd, _bwd)


def rspmm_pallas(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op):
    """Entry point used by rspmm.generalized_rspmm(backend='pallas') when no
    prebuilt plan is available: builds plans on the fly (host round-trip —
    prefer attaching GraphPlans to the Graph for hot paths)."""
    if sum_op != "add":
        raise NotImplementedError("pallas rspmm currently implements sum aggregation")
    ei = np.asarray(jax.device_get(edge_index))
    et = np.asarray(jax.device_get(edge_type))
    live = np.asarray(jax.device_get(edge_weight)) != 0
    plans = GraphPlans.build(ei[:, live], et[live], num_nodes, int(relation.shape[0]))
    w_live = edge_weight[jnp.asarray(np.nonzero(live)[0])]
    return rspmm_pallas_sum(mul_op, num_nodes, None, plans, relation, x, w_live)
