"""Third-generation Pallas rspmm forward (sum aggregation): windowed
in-kernel gather — no materialized edge stream at all.

The v2 design (rspmm_pallas_v2.py) materializes the gathered (E_pad, F)
stream through XLA, paying it three times over HBM (random read + write +
re-read) — a structural cap of ~255 M edges/s at the FB15k-237 eval shape
(ROOFLINE.md). w3 removes the stream:

  - Edges are assigned to CELLS (dst block of rb2 compact rows x source
    WINDOW of W consecutive x rows) and padded per cell to chunks of
    C == W edges.
  - Per grid step, the normal Pallas input pipeline DMAs the chunk's
    window x[win*W : (win+1)*W] into VMEM, double-buffered, selected by a
    scalar-prefetched per-chunk window id — consecutive chunks of one cell
    reuse the resident window (HBM reads ~= one window per cell, ~0.6 GB
    vs v2's 1.9 GB at the bench shape, fully overlapped with compute).
  - The in-kernel gather is Mosaic's SAME-SHAPE dynamic_gather
    (jnp.take_along_axis(window, idx, axis=0) with operand == indices ==
    output shape (W, F) — the one gather form the lowering accepts, which
    is why C must equal W).
  - No fold: the chunk's messages flush directly into the resident
    compact-dst output block with one one-hot matmul (rb2*F*2 FLOP/edge).
    Cost/edge ~ (tw + rb2) * F * 2 ~ 0.52 MFLOP at the bench shape — MXU
    bound ~0.8 ms for 616K edges if the gather is VPU-speed.

Scope: sum aggregation forward — which also serves d_x (the same kernel on
the src-swapped plan, exactly like v2). d_rel and min/max stay on the v2
kernels. Gated off by default (ULTRA_W3=1 or attach_plans(w3=True)) until
the on-chip probe (scripts/exp_dma_gather.py) confirms the same-shape
gather lowers at speed on this Mosaic.

Semantics parity target: rspmm.cpp:50-75 (sum over w_e * op(rel[t], x[src])).
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

from ultra_tpu.ops.rspmm_pallas import _interpret, _onehot, _pad8, _prec, _round_up
from ultra_tpu.ops.rspmm_pallas_v2 import _f_blocking, _group_tables


@struct.dataclass
class PlanW3:
    """Host-built windowed layout. Chunk size C == window size W.

    ``rel_gather=True`` (auto when r_pad <= W): the relation rows are also
    fetched by a same-shape gather from ONE resident (W, F) relation
    window — no table clustering, no tw-wide one-hot select (the dominant
    MXU cost on uniform-histogram graphs); type_local then holds GLOBAL
    padded relation ids and the table fields are trivial."""

    src_local: jax.Array   # (K, W) int32 in [0, W) — src row within window
    dst_local: jax.Array   # (K, W) int32 in [0, rb2]; rb2 = pad sentinel
    type_local: jax.Array  # (K, W) int32 in [0, tw)
    perm: jax.Array        # (K, W) int32 into (graph_E_pad+1,) ext weights
    win_id: jax.Array      # (K,) int32 — x window per chunk
    out_blk: jax.Array     # (K,) int32 — compact-dst block per chunk
    group_id: jax.Array    # (K,) int32 — relation-table block per chunk
    table_ids: jax.Array   # (n_groups * tw,) int32 into padded rel table
    tab_valid: jax.Array   # (n_groups * tw,) f32 1/0
    rank: jax.Array        # (V,) int32 node -> compact row (pads -> n_c_pad)
    present: jax.Array     # (n_c_pad,) int32 compact row -> node id
    num_chunks: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    tw: int = struct.field(pytree_node=False)
    n_groups: int = struct.field(pytree_node=False)
    rb2: int = struct.field(pytree_node=False)
    n_compact_pad: int = struct.field(pytree_node=False)
    n_win: int = struct.field(pytree_node=False)  # windows covering V
    e_pad: int = struct.field(pytree_node=False)
    rel_gather: bool = struct.field(pytree_node=False, default=False)


def build_plan_w3(
    edge_index: np.ndarray,  # (2, E) live edges, [dst, src]
    edge_type: np.ndarray,
    num_nodes: int,
    num_relations: int,
    *,
    window: int = 1024,
    rb2: int = 384,
    tw: int = 128,
    edge_ids: Optional[np.ndarray] = None,
    dead_slot: Optional[int] = None,
    cluster: bool = True,
    table_budget: float = 0.5,
    rel_gather: Optional[bool] = None,  # default: on when r_pad <= window
) -> PlanW3:
    """Assign edges to (dst block, src window) cells, pad each cell to
    multiples of W, group chunks under shared relation tables."""
    ei = np.asarray(edge_index)
    et = np.asarray(edge_type).astype(np.int64)
    dst, src = ei[0].astype(np.int64), ei[1].astype(np.int64)
    e = dst.shape[0]
    if edge_ids is None:
        edge_ids = np.arange(e, dtype=np.int64)
    if dead_slot is None:
        dead_slot = int(e)
    r_pad = max(_round_up(num_relations, 8), 8)
    n_win = max(_round_up(num_nodes, window) // window, 1)

    # compact dst space ordered by type signature (narrows table groups on
    # power-law KGs, exactly as the v2 planner does)
    deg = np.bincount(dst, minlength=num_nodes)
    present = np.nonzero(deg)[0]
    if cluster and len(present):
        from ultra_tpu.ops.rspmm_pallas_v2 import _type_signatures

        sigs = _type_signatures(dst, et, num_nodes)
        present = np.array(sorted(present, key=lambda v: sigs[int(v)]),
                           dtype=np.int64)
    n_c = len(present)
    rank = np.full(num_nodes, -1, dtype=np.int64)
    rank[present] = np.arange(n_c)

    blk = rank[dst] // rb2
    win = src // window
    cell = blk * n_win + win
    # order: (block, window, type) — type-sorting narrows per-chunk tables
    order = np.lexsort((et, cell))
    cell_s = cell[order]
    uniq, counts = np.unique(cell_s, return_counts=True)
    padded = (-(-counts // window)) * window
    e_pad = int(padded.sum())
    k = e_pad // window

    starts = np.cumsum(padded) - padded
    within = np.arange(e, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    slots = np.repeat(starts, counts) + within

    src_local = np.zeros(e_pad, np.int32)
    dst_local = np.full(e_pad, rb2, np.int32)   # sentinel = pad
    types_p = np.zeros(e_pad, np.int64)
    perm = np.full(e_pad, dead_slot, np.int64)
    live = np.zeros(e_pad, bool)
    src_local[slots] = (src[order] % window).astype(np.int32)
    dst_local[slots] = (rank[dst][order] % rb2).astype(np.int32)
    types_p[slots] = et[order]
    perm[slots] = edge_ids[order]
    live[slots] = True

    chunk_cell = np.repeat(uniq, padded // window) if k else np.zeros(0, np.int64)
    out_blk = (chunk_cell // n_win).astype(np.int32)
    win_id = (chunk_cell % n_win).astype(np.int32)

    types_c = types_p.reshape(k, window)
    live_c = live.reshape(k, window)
    if rel_gather is None:
        rel_gather = r_pad <= window
    assert not (rel_gather and r_pad > window), (r_pad, window)
    if rel_gather:
        # relation rows fetched by the same-shape gather from one resident
        # (W, F) relation window: global ids, trivial table machinery
        tw, n_groups = window, 1
        group_id = np.zeros(k, np.int32)
        table_ids = np.arange(window, dtype=np.int64).clip(0, r_pad - 1)
        type_local = types_c.astype(np.int32)
    else:
        tw, n_groups, group_id, table_ids, type_local = _group_tables(
            types_c, live_c, tw, r_pad, e_pad, cluster, table_budget
        )

    n_c_pad = _round_up(max(n_c, 1), rb2)
    rank_out = np.where(rank >= 0, rank, n_c_pad).astype(np.int32)
    present_pad = np.zeros(n_c_pad, np.int64)
    present_pad[:n_c] = present
    return PlanW3(
        src_local=jnp.asarray(src_local.reshape(k, window)),
        dst_local=jnp.asarray(dst_local.reshape(k, window)),
        type_local=jnp.asarray(type_local),
        perm=jnp.asarray(perm.reshape(k, window).astype(np.int32)),
        win_id=jnp.asarray(win_id),
        out_blk=jnp.asarray(out_blk),
        group_id=jnp.asarray(group_id),
        table_ids=jnp.asarray(table_ids.astype(np.int32)),
        tab_valid=jnp.ones((n_groups * tw,), jnp.float32),
        rank=jnp.asarray(rank_out),
        present=jnp.asarray(present_pad.astype(np.int32)),
        num_chunks=k,
        window=window,
        tw=int(tw),
        n_groups=int(n_groups),
        rb2=rb2,
        n_compact_pad=n_c_pad,
        n_win=int(n_win),
        e_pad=e_pad,
        rel_gather=bool(rel_gather),
    )


def plan_stats(plan: PlanW3, e_live: int) -> dict:
    """Padding/traffic diagnostics for ROOFLINE accounting."""
    k = plan.num_chunks
    win_changes = int(np.sum(np.diff(np.asarray(plan.win_id)) != 0) + 1) if k else 0
    return {
        "e_pad": plan.e_pad,
        "pad_waste": round(plan.e_pad / max(e_live, 1), 3),
        "chunks": k,
        "window_dmas": win_changes,  # pipeline re-DMAs only on win change
        "tw": plan.tw,
        "n_groups": plan.n_groups,
    }


def _w3_kernel(mul_op, rel_gather, c, tw, rb2, prec,
               group_ref, win_ref_ids, blk_ref,
               tl_ref, w_ref, srcl_ref, dstl_ref, xw_ref, tab_ref,
               out_ref):
    """One chunk of C == W edges: same-shape gather from the resident
    window + relation rows (same-shape gather from the resident relation
    window, or a clustered tw-wide one-hot select) + message + one-hot
    flush into the resident compact-dst block."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    cdt = xw_ref.dtype

    @pl.when((k == 0) | (blk_ref[k] != blk_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    tl = tl_ref[pl.ds(row, 1), :][0]
    wcol = w_ref[pl.ds(row, 1), :][0][:, None].astype(cdt)
    srcl = srcl_ref[pl.ds(row, 1), :][0]
    dstl = dstl_ref[pl.ds(row, 1), :][0]

    fw = xw_ref.shape[1]
    idx2d = jnp.broadcast_to(srcl[:, None], (c, fw))
    xe = jnp.take_along_axis(xw_ref[:], idx2d, axis=0)       # (C, F) gather

    if rel_gather:
        idxr = jnp.broadcast_to(tl[:, None], (c, fw))
        relg = jnp.take_along_axis(tab_ref[:], idxr, axis=0)  # (C, F) gather
        msg = xe * relg * wcol if mul_op == "mul" else (xe + relg) * wcol
    else:
        sel = _onehot(tl, tw, cdt)
        if mul_op == "mul":
            sel = sel * wcol
        relg = jnp.dot(sel, tab_ref[:], preferred_element_type=jnp.float32,
                       precision=prec).astype(cdt)
        msg = xe * relg if mul_op == "mul" else (xe + relg) * wcol

    s = _onehot(dstl, rb2, jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        s, msg,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def rspmm_w3_fwd(
    plan: PlanW3,
    relation: jax.Array,   # (R, F)
    x: jax.Array,          # (V, F)
    edge_weight_ext: jax.Array,  # (graph_E_pad + 1,)
    *,
    mul: str = "mul",
    out_rows: Optional[int] = None,
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """Sum-aggregation forward, windowed in-kernel gather."""
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    if plan.num_chunks == 0:
        return jnp.zeros((rows, f), jnp.float32)
    f_blk, nf = _f_blocking(f, f_block)
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    r_pad = max(_round_up(relation.shape[0], 8), 8)
    rel_pad = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    if plan.rel_gather:
        # one resident (W, F) relation window (rows >= r_pad are zeros,
        # never gathered — live type ids are < r_pad)
        tabs = jnp.pad(
            rel_pad.astype(stream_dt), ((0, plan.window - r_pad), (0, 0))
        )
    else:
        tabs = jnp.take(rel_pad.astype(stream_dt), plan.table_ids, axis=0)
    v_pad = plan.n_win * plan.window
    x_w = jnp.pad(x.astype(stream_dt), ((0, v_pad - n), (0, 0)))
    w_p = jnp.take(edge_weight_ext, plan.perm.reshape(-1), axis=0)

    k, c = plan.num_chunks, plan.window
    out_c = pl.pallas_call(
        functools.partial(
            _w3_kernel, mul, plan.rel_gather, c, plan.tw, plan.rb2, prec
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, w, b: (k // 8, 0)),  # type_local
                pl.BlockSpec((8, c), lambda j, k, g, w, b: (k // 8, 0)),  # weights
                pl.BlockSpec((8, c), lambda j, k, g, w, b: (k // 8, 0)),  # src_local
                pl.BlockSpec((8, c), lambda j, k, g, w, b: (k // 8, 0)),  # dst_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, w, b: (w[k], j)),  # window
                pl.BlockSpec((plan.tw, f_blk),
                             lambda j, k, g, w, b: (g[k], j)),            # table
            ],
            out_specs=pl.BlockSpec(
                (plan.rb2, f_blk), lambda j, k, g, w, b: (b[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_compact_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.win_id, plan.out_blk,
      _pad8(plan.type_local), _pad8(w_p.reshape(k, c)),
      _pad8(plan.src_local), _pad8(plan.dst_local), x_w, tabs)

    out_ext = jnp.concatenate([out_c, jnp.zeros((1, f), out_c.dtype)])
    return jnp.take(out_ext, jnp.minimum(plan.rank[:rows], plan.n_compact_pad),
                    axis=0)
