"""Second-generation Pallas rspmm forward (sum aggregation): gather-outside,
fold-inside, single fused kernel.

The v1 kernel (rspmm_pallas.py) is FLOP-bound: every edge pays three one-hot
selection matmuls of width (rb_gather + r_pad + rb_reduce) ~ 1248 columns,
~1.28 MFLOP/edge at F=512 — ~10^4x the useful work. Measured on-chip, the
*memory* system is far cheaper than that FLOP bill: a plain XLA row gather
(`jnp.take`) moves 595K x 1KB bf16 rows in ~1.2 ms (473 M rows/s; scatter is
what never completes on this TPU, not gather). v2 restructures the forward
around that, replacing the widest one-hot (the gather) with the XLA gather
engine and the reduce with an 8-edge fold:

  1. **XLA gather**  x_e = x[src]  in a dst-major, per-dst-padded-to-8 edge
     layout (E_pad rows, bf16). Pure gathers run at memory speed; composed
     gather+elementwise XLA fusions do NOT (measured 10+ ms) — so the
     gather stands alone and everything downstream is one Pallas kernel.
  2. **Fused kernel**, per chunk of C=128 edges:
       relg  = onehot(type_local, TW) @ table_block     [MXU, TW<=128 wide]
       m     = (x_e ⊙ relg | x_e + relg) * w            [VPU]
       slot  = fold16 @ m                               [MXU, banded 16xC]
       scratch[(k%8)*16 : +16] = slot
       every 8th chunk:
       out  += onehot(slot_dst_local, RB2)^T @ scratch  [MXU, K-dim 128]
     The fold is a *matmul* against a constant banded matrix — a
     reshape(16,8,F).sum(1) is a sublane-crossing relayout Mosaic executes
     slowly, but an MXU contraction with K=C is native. The flush matmul
     reduces 128 slot rows at a time into the VMEM-resident compact-dst
     output block (revisit discipline as in the v1 forward); slot runs
     never straddle flush groups because the edge layout pads each output
     block to 1024-edge boundaries.
     The relation select is TW<=128 wide (1 MXU tile) instead of r_pad~480
     because the planner *clusters* output nodes by relation-type signature
     and emits one TW-row table per run of chunks (the table block is picked
     by a scalar-prefetched group id). On graphs where clustering fails
     (uniform relation histograms) the planner falls back to one global
     table of width r_pad.
  3. A final V-row `jnp.take` maps compact rows back to node ids.

Cost/edge (F=512, bf16 pass): ~2 KB HBM (the gather) + (TW + 16 + RB2/8)
* F * 2 FLOPs ~ 0.2 MFLOP — ~6x less MXU work than v1 and the HBM side
runs concurrently. See ROOFLINE.md for the measured floors.

Scope: sum aggregation forward only (the zero-shot inference hot path —
reference config/transductive/inference.yaml). Gradients and min/max reuse
the v1 kernels (rspmm_pallas.py); the custom VJP in rspmm_pallas_sum picks
v2 for the primal when a PlanV2 is attached. Semantics parity target:
rspmm.cpp:50-75 (sum over w_e * op(rel[t_e], x[src_e])).
"""

from __future__ import annotations

import contextlib as _contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ultra_tpu.ops.rspmm_pallas import _interpret, _onehot, _pad8, _prec, _round_up

FOLD = 8    # edges folded per slot on the MXU (sublane granularity)
ALIGN = 1024  # edge-layout block alignment = one flush group (128 slots)
# Max bytes of (E_pad, F) bf16 gather stream materialized at once; wider
# feature axes are processed in independent F-slices (the whole pipeline is
# elementwise along F), so v2 serves any batch width with bounded HBM.
# Env override for pretrain-width sweeps (scripts/exp_pretrain_width.py).
import os as _os

SLICE_BYTES = int(float(_os.environ.get("ULTRA_V2_SLICE_BYTES", "1e9")))
# Auto-escalated table widths (uniform histograms) are accepted only while
# total table rows stay under this fraction of the edge stream — above it
# the table DMA outweighs the narrower select (measured, _group_tables).
TW_ACCEPT = float(_os.environ.get("ULTRA_V2_TW_ACCEPT", "0.12"))
# Eval-only probe: per-row-symmetric int8 gather stream for the sum/mul
# forward (scale folded into the edge weight). Lossy (~row-scale int8
# quantization of activations) — measure MRR before shipping results.
STREAM_INT8 = _os.environ.get("ULTRA_V2_STREAM_INT8", "0") == "1"


def _vmem_limit_kw():
    """ULTRA_V2_VMEM_MB: optional Mosaic VMEM budget override for the v2
    forward (deeper input double-buffering; measured via bench.py)."""
    mb = os.environ.get("ULTRA_V2_VMEM_MB", "")
    return {"vmem_limit_bytes": int(mb) << 20} if mb else {}


_EVAL_BUDGET: Optional[int] = None


def _f_slice_width(e_pad: int, f: int) -> int:
    """Largest lane-aligned slice width whose stream fits SLICE_BYTES.

    Under an active eval ``stream_budget``, a full-width stream within the
    budget runs UNSLICED; otherwise the training width applies unchanged.
    All-or-nothing on purpose: the 120K/2M probe (evidence/r5/
    bigmem_eval.log) showed mid-width slices are the worst of both worlds
    (F=1024: unsliced 584 ms, 128-slices 648, 512-slices 758) — narrow
    slices pipeline gather/kernel well, unsliced avoids re-reads, the
    middle does neither."""
    if _EVAL_BUDGET is not None and e_pad * 2 * f <= _EVAL_BUDGET:
        return f
    max_f = max(128, SLICE_BYTES // (e_pad * 2) // 128 * 128)
    return f if f <= max_f else max_f


# Inference-only stream budget: the 1e9 SLICE_BYTES default protects
# TRAINING (the materialized gather stream competes with remat traffic —
# measured losses at pretrain width, ROOFLINE round-3), but a forward-only
# eval pass has no remat and the stream is a transient. The fused
# both-direction eval scorer at B=8 is F=1024, whose FB-scale stream
# (614400 x 1024 x 2B = 1.26 GB) tripped the training gate and paid a
# 768+256 split — 21% of e2e eval wall (11.2 -> 8.9 ms/triple,
# evidence/r5/eval_decomp*.log). Eval paths wrap their jit-tracing calls
# in ``stream_budget(EVAL_SLICE_BYTES)``: streams within the budget run
# unsliced, larger ones keep the training slicing (HBM stays safe).
EVAL_SLICE_BYTES = int(float(_os.environ.get("ULTRA_V2_EVAL_SLICE_BYTES",
                                             "2.8e9")))


@_contextlib.contextmanager
def stream_budget(nbytes: int):
    """Activate the eval unslice-if-it-fits budget (trace-time only —
    wrap the call that triggers jit tracing; cached executables are
    unaffected)."""
    global _EVAL_BUDGET
    old = _EVAL_BUDGET
    _EVAL_BUDGET = int(nbytes)
    try:
        yield
    finally:
        _EVAL_BUDGET = old


@struct.dataclass
class PlanV2:
    """Host-built layout for the v2 forward. All edge positions refer to the
    padded dst-major layout of length ``e_pad`` (multiple of 1024)."""

    src_p: jax.Array       # (E_pad,) int32 — src node per slot (pads -> 0)
    perm: jax.Array        # (E_pad,) int32 into (graph_E_pad+1,) ext weights
    type_local: jax.Array  # (K, C) int32 in [0, tw)
    group_id: jax.Array    # (K,) int32 — relation-table block per chunk
    table_ids: jax.Array   # (n_groups * tw,) int32 into the padded rel table
    k2_local: jax.Array    # (K2, 128) int32 in [0, rb2]; rb2 = pad sentinel;
    #                        one row per ALIGN-edge flush group
    k2_blk: jax.Array      # (K2,) int32 — compact-dst block per flush group
    rank: jax.Array        # (V,) int32 — node -> compact row (pads -> n_c_pad)
    present: jax.Array     # (n_c_pad,) int32 — compact row -> node id (pads 0)
    dst_local: jax.Array   # (K, C) int32 in [0, rb2]; per-EDGE dst rank within
    #                        its block (rb2 = pad) — the min/max kernel's
    #                        scan segments; contiguous iff sort_slots=False
    tab_valid: jax.Array   # (n_groups * tw,) f32 1/0 — masks table rows the
    #                        rel-grad kernel never writes (pad groups added
    #                        by pad_plan_v2 for cross-shard shape matching)
    num_chunks: int = struct.field(pytree_node=False)
    chunk: int = struct.field(pytree_node=False)
    tw: int = struct.field(pytree_node=False)
    n_groups: int = struct.field(pytree_node=False)
    k2_chunks: int = struct.field(pytree_node=False)
    rb2: int = struct.field(pytree_node=False)
    n_compact_pad: int = struct.field(pytree_node=False)
    e_pad: int = struct.field(pytree_node=False)
    sorted_slots: bool = struct.field(pytree_node=False, default=False)
    # relation rows fetched by a same-shape in-kernel gather from ONE
    # resident (chunk, F) relation window instead of the tw-wide one-hot
    # select; type_local then holds GLOBAL padded relation ids. Probe-gated
    # (requires Mosaic's same-shape dynamic_gather — see rspmm_pallas_w3).
    # fwd/d_x only: the rel-grad's OUTPUT is the table, so it keeps the
    # clustered plan.
    rel_gather: bool = struct.field(pytree_node=False, default=False)


def _type_signatures(dst: np.ndarray, et: np.ndarray, num_nodes: int):
    """Per-dst sorted distinct-type tuple, for clustering nodes with similar
    relation profiles next to each other (keeps per-group type unions small
    on power-law KGs; on uniform graphs this achieves nothing and the
    planner falls back to a full-width table)."""
    order = np.lexsort((et, dst))
    d_s, t_s = dst[order], et[order]
    sigs = {}
    starts = np.searchsorted(d_s, np.arange(num_nodes))
    ends = np.searchsorted(d_s, np.arange(num_nodes), side="right")
    for v in np.nonzero(ends > starts)[0]:
        sigs[int(v)] = tuple(np.unique(t_s[starts[v]:ends[v]]))
    return sigs


def _group_tables(types_c, live_c, tw, r_pad, e_pad, cluster, table_budget):
    """Greedy run-grouping of chunks under shared TW-row relation tables
    (chunks in layout order accumulate their live type sets until a group
    would exceed tw). When the requested width fails (some single chunk's
    distinct-type count exceeds tw — uniform histograms), auto-escalates
    ONCE to the feasibility floor round_up(max per-chunk distinct, 8)
    before falling back to one global full-width table: on the uniform
    bench graph the floor width (352 vs the 480 global) wins 7-15% across
    fwd/d_x/d_rel (output/r4/uniform_tw3.log). Returns
    (tw, n_groups, group_id (K,), table_ids (n_groups*tw,), type_local)."""
    k, chunk = types_c.shape
    chunk_types = [
        set(np.unique(types_c[ck][live_c[ck]]).tolist()) for ck in range(k)
    ]

    def greedy(width):
        groups, tables = [], []
        cur: set = set()
        cur_start = 0
        for ck, t in enumerate(chunk_types):
            if len(cur | t) > width and cur:
                tables.append(sorted(cur))
                groups.append((cur_start, ck))
                cur, cur_start = set(t), ck
            else:
                cur |= t
        if k:
            tables.append(sorted(cur))
            groups.append((cur_start, k))
        return groups, tables

    def fails(width, tables):
        too_wide = any(len(tab) > width for tab in tables)
        return too_wide or len(tables) * width > table_budget * e_pad

    groups, tables = greedy(tw)
    if cluster and fails(tw, tables):
        floor = max((len(t) for t in chunk_types), default=0)
        tw2 = max(_round_up(floor, 8), 8)
        if tw < tw2 < r_pad:
            g2, t2 = greedy(tw2)
            # acceptance gate: the narrow tables must stay cheap relative
            # to the edge stream, or their DMA outweighs the select saving
            # (measured: 141 groups x 352 rows = 0.08*e_pad wins +15%;
            # 440 x 432 = 0.31*e_pad LOSES 13% — output/r4/uniform_tw3.log
            # vs bench_autotw.log). sort_slots=True layouts have low
            # floors and pass; unsorted layouts on uniform histograms
            # fail and keep the global table.
            if (not fails(tw2, t2)
                    and len(t2) * tw2 <= TW_ACCEPT * e_pad):
                tw, groups, tables = tw2, g2, t2

    n_groups = len(tables)
    if fails(tw, tables) or not cluster:
        # clustering failed (or disabled): one global full-width table
        tw = r_pad
        n_groups = 1
        group_id = np.zeros(k, np.int32)
        table_ids = np.arange(r_pad, dtype=np.int64)
        type_local = types_c.astype(np.int32)
    else:
        group_id = np.zeros(k, np.int32)
        table_ids = np.zeros(n_groups * tw, np.int64)
        type_local = np.zeros((k, chunk), np.int32)
        for gi, ((s, t), tab) in enumerate(zip(groups, tables)):
            group_id[s:t] = gi
            table_ids[gi * tw: gi * tw + len(tab)] = tab
            tab_arr = np.asarray(tab, dtype=np.int64)
            for ck in range(s, t):
                type_local[ck] = np.searchsorted(tab_arr, types_c[ck]).clip(
                    0, max(len(tab) - 1, 0)
                )
    return tw, n_groups, group_id, table_ids, type_local


def build_plan_v2(
    edge_index: np.ndarray,  # (2, E) live edges, [dst, src]
    edge_type: np.ndarray,
    num_nodes: int,
    num_relations: int,
    *,
    chunk: int = 128,
    tw: int = 128,
    rb2: int = 384,
    edge_ids: Optional[np.ndarray] = None,
    dead_slot: Optional[int] = None,
    cluster: bool = True,
    sort_slots: bool = True,
    table_budget: float = 0.5,  # max table rows as a fraction of E_pad
    rel_gather: bool = False,
    src_sort: bool = False,
) -> PlanV2:
    """Lay out edges dst-major (clustered order), pad per dst to multiples
    of FOLD and per compact block to multiples of ALIGN, group chunks
    under shared TW-row relation tables."""
    assert chunk % FOLD == 0 and ALIGN % chunk == 0, chunk
    ei = np.asarray(edge_index)
    et = np.asarray(edge_type).astype(np.int64)
    dst, src = ei[0].astype(np.int64), ei[1].astype(np.int64)
    e = dst.shape[0]
    if edge_ids is None:
        edge_ids = np.arange(e, dtype=np.int64)
    if dead_slot is None:
        dead_slot = int(e)
    r_pad = max(_round_up(num_relations, 8), 8)

    deg = np.bincount(dst, minlength=num_nodes)
    present = np.nonzero(deg)[0]
    if cluster and len(present):
        sigs = _type_signatures(dst, et, num_nodes)
        present = np.array(sorted(present, key=lambda v: sigs[int(v)]), dtype=np.int64)
    n_c = len(present)
    rank = np.full(num_nodes, -1, dtype=np.int64)
    rank[present] = np.arange(n_c)

    # --- edge layout -----------------------------------------------------
    deg_p = deg[present]                       # per compact dst
    deg8 = (-(-deg_p // FOLD)) * FOLD          # per-dst pad to FOLD
    blk_of = np.arange(n_c) // rb2
    n_blk = int(blk_of[-1]) + 1 if n_c else 0
    blk_edges = np.zeros(n_blk, np.int64)
    np.add.at(blk_edges, blk_of, deg8)
    blk_padded = (-(-blk_edges // ALIGN)) * ALIGN  # flush groups never straddle
    blk_base = np.concatenate([[0], np.cumsum(blk_padded)])[:-1]
    # per-dst start: block base + running sum of deg8 within the block
    within = np.cumsum(deg8) - deg8
    within -= np.repeat(np.concatenate([[0], np.cumsum(blk_edges)])[:-1],
                        np.bincount(blk_of, minlength=n_blk))
    dst_start = blk_base[blk_of] + within
    e_pad = int(blk_padded.sum())
    k = e_pad // chunk
    n1 = e_pad // FOLD                         # slot rows the fold emits
    k2 = e_pad // ALIGN                        # flush groups (k == k2*ALIGN/chunk)

    # scatter live edges into their slots (dst-major, per-dst type-sorted).
    # ``src_sort`` adds a source-row tiebreak (and a per-slot min-src slot
    # tiebreak below): same dst runs, same type windows, but gather indices
    # become locally monotonic — a probe for XLA-gather DRAM locality.
    if src_sort:
        order = np.lexsort((src, et, rank[dst]))
    else:
        order = np.lexsort((et, rank[dst]))
    within_dst = np.arange(e) - np.repeat(np.cumsum(deg_p) - deg_p, deg_p)
    pos = dst_start[rank[dst][order]] + within_dst
    src_p = np.zeros(e_pad, np.int64)
    types_p = np.zeros(e_pad, np.int64)
    perm = np.full(e_pad, dead_slot, np.int64)
    live = np.zeros(e_pad, bool)
    src_p[pos] = src[order]
    types_p[pos] = et[order]
    perm[pos] = edge_ids[order]
    live[pos] = True

    # slot -> compact dst (sentinel rb2 marks pad slots)
    slot_rank = np.full(n1, -1, np.int64)
    n_slots = deg8 // FOLD
    slot_pos = np.repeat(dst_start // FOLD, n_slots) + (
        np.arange(int(n_slots.sum())) -
        np.repeat(np.cumsum(n_slots) - n_slots, n_slots)
    )
    slot_rank[slot_pos] = np.repeat(np.arange(n_c), n_slots)

    # Slots within one compact block's padded region are order-free (the
    # flush matmul accumulates into the resident block regardless of which
    # ALIGN group a slot sits in), so sort them by their min live edge type:
    # chunks then see narrow type windows even on uniform relation
    # histograms, keeping the clustered tables at tw<=128.
    # ``sort_slots=False`` keeps each dst's edges contiguous — required by
    # the min/max kernel's run-segmented scan (select-last breaks if a dst
    # splits into multiple runs).
    if n_blk and sort_slots:
        slot_types = np.where(live, types_p, np.int64(1 << 40)).reshape(n1, FOLD)
        slot_key = slot_types.min(axis=1)          # pads sort last
        slot_blk = np.repeat(np.arange(n_blk), blk_padded // FOLD)
        if src_sort:
            slot_src = np.where(live, src_p, np.int64(1 << 40)).reshape(n1, FOLD)
            slot_order = np.lexsort((slot_src.min(axis=1), slot_key, slot_blk))
        else:
            slot_order = np.lexsort((slot_key, slot_blk))
        edge_perm = (slot_order[:, None] * FOLD +
                     np.arange(FOLD)[None, :]).ravel()
        src_p, types_p = src_p[edge_perm], types_p[edge_perm]
        perm, live = perm[edge_perm], live[edge_perm]
        slot_rank = slot_rank[slot_order]

    k2_local = np.where(slot_rank >= 0, slot_rank % rb2, rb2).astype(np.int32)
    k2_blk = np.zeros(k2, np.int32)
    if k2:
        # every flush group sits inside one block by the ALIGN padding
        first = slot_rank.reshape(k2, ALIGN // FOLD).max(axis=1)  # -1 iff all-pad
        k2_blk = np.maximum(first, 0) // rb2
        k2_blk = np.maximum.accumulate(k2_blk).astype(np.int32)  # all-pad groups

    # --- relation-table grouping -----------------------------------------
    types_c = types_p.reshape(k, chunk)
    live_c = live.reshape(k, chunk)
    if rel_gather:
        assert r_pad <= chunk, (r_pad, chunk)
        tw, n_groups = chunk, 1
        group_id = np.zeros(k, np.int32)
        table_ids = np.arange(chunk, dtype=np.int64).clip(0, r_pad - 1)
        type_local = types_c.astype(np.int32)
    else:
        tw, n_groups, group_id, table_ids, type_local = _group_tables(
            types_c, live_c, tw, r_pad, e_pad, cluster, table_budget
        )

    n_c_pad = _round_up(max(n_c, 1), rb2)
    rank_out = np.where(rank >= 0, rank, n_c_pad).astype(np.int32)
    present_pad = np.zeros(n_c_pad, np.int64)
    present_pad[:n_c] = present
    return PlanV2(
        src_p=jnp.asarray(src_p.astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        type_local=jnp.asarray(type_local),
        group_id=jnp.asarray(group_id),
        table_ids=jnp.asarray(table_ids.astype(np.int32)),
        k2_local=jnp.asarray(k2_local.reshape(k2, ALIGN // FOLD)),
        k2_blk=jnp.asarray(k2_blk),
        rank=jnp.asarray(rank_out),
        present=jnp.asarray(present_pad.astype(np.int32)),
        dst_local=jnp.asarray(np.repeat(k2_local, FOLD).reshape(k, chunk)),
        tab_valid=jnp.ones((n_groups * tw,), jnp.float32),
        sorted_slots=bool(sort_slots),
        rel_gather=bool(rel_gather),
        num_chunks=k,
        chunk=chunk,
        tw=int(tw),
        n_groups=int(n_groups),
        k2_chunks=k2,
        rb2=rb2,
        n_compact_pad=n_c_pad,
        e_pad=e_pad,
    )


def pad_plan_v2(
    plan: PlanV2,
    e_pad_target: int,
    n_groups_target: int,
    n_c_pad_target: int,
    dead_slot: int,
) -> PlanV2:
    """Pad a PlanV2 so its static shape fields match across edge shards
    (build_sharded_plans stacks per-shard plans with a leading shard axis,
    which requires identical array shapes and static fields).

    Appended edges are dead (weight perm -> dead_slot => 0), appended
    chunks keep the last group/block ids (their flushes add zeros to an
    already-visited block; their tables are the last valid one), and
    appended table groups are masked by tab_valid (no chunk writes them)."""
    assert e_pad_target % ALIGN == 0
    k_old, c = plan.num_chunks, plan.chunk
    k_new = e_pad_target // c
    k2_new = e_pad_target // ALIGN
    extra_e = e_pad_target - plan.e_pad
    extra_k = k_new - k_old
    extra_k2 = k2_new - plan.k2_chunks
    assert extra_e >= 0 and n_groups_target >= plan.n_groups
    assert n_c_pad_target >= plan.n_compact_pad

    # n_groups can be 0 when a shard received no live edges (np.array_split
    # in build_sharded_plans): clamp so appended chunks' group_id stays a
    # valid scalar-prefetched table-block index (their weights are 0, so any
    # valid table is harmless) instead of -1 wrapping out of bounds.
    last_gid = np.int32(max(plan.n_groups - 1, 0))
    last_blk = plan.k2_blk[-1] if plan.k2_chunks else jnp.int32(0)
    n_tab_new = n_groups_target * plan.tw
    tab_valid = jnp.zeros((n_tab_new,), jnp.float32)
    tab_valid = tab_valid.at[: plan.tab_valid.shape[0]].set(plan.tab_valid)
    table_ids = jnp.zeros((n_tab_new,), jnp.int32)
    table_ids = table_ids.at[: plan.table_ids.shape[0]].set(plan.table_ids)

    # old compact-pad sentinel rows in rank must point at the NEW appended
    # zero row (old sentinel now lands inside uninitialized pad blocks)
    rank = jnp.where(
        plan.rank >= plan.n_compact_pad, n_c_pad_target, plan.rank
    ).astype(jnp.int32)

    return plan.replace(
        src_p=jnp.concatenate([plan.src_p, jnp.zeros((extra_e,), jnp.int32)]),
        perm=jnp.concatenate(
            [plan.perm, jnp.full((extra_e,), dead_slot, jnp.int32)]
        ),
        type_local=jnp.concatenate(
            [plan.type_local, jnp.zeros((extra_k, c), jnp.int32)]
        ),
        group_id=jnp.concatenate(
            [plan.group_id, jnp.full((extra_k,), last_gid, jnp.int32)]
        ),
        table_ids=table_ids,
        tab_valid=tab_valid,
        k2_local=jnp.concatenate(
            [plan.k2_local,
             jnp.full((extra_k2, ALIGN // FOLD), plan.rb2, jnp.int32)]
        ),
        k2_blk=jnp.concatenate(
            [plan.k2_blk, jnp.full((extra_k2,), last_blk, jnp.int32)]
        ),
        rank=rank,
        present=jnp.concatenate(
            [plan.present,
             jnp.zeros((n_c_pad_target - plan.n_compact_pad,), jnp.int32)]
        ),
        dst_local=jnp.concatenate(
            [plan.dst_local, jnp.full((extra_k, c), plan.rb2, jnp.int32)]
        ),
        num_chunks=k_new,
        n_groups=int(n_groups_target),
        k2_chunks=k2_new,
        n_compact_pad=int(n_c_pad_target),
        e_pad=int(e_pad_target),
    )


def _fused_kernel(mul_op, rel_gather, c, g, tw, rb2, prec,
                  group_ref, blk_ref, tl_ref, w_ref, k2l_ref, xe_ref, tab_ref,
                  out_ref, scratch):
    """Chunk of C edges -> C/FOLD slot rows staged in scratch; every g-th
    chunk (g = ALIGN // C) flushes 128 staged slots into the resident
    compact-dst block with one one-hot matmul (same revisit discipline as
    the v1 forward). The whole pipeline runs in the stream dtype (bf16 at
    default precision — matching v1's bf16-pass MXU contract — and f32
    under 'highest'/interpret); only slot partials and the output
    accumulate in f32."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)          # row within the (8, C) metadata blocks
    nslot = c // FOLD
    # compute dtype follows the relation table; the edge stream may arrive
    # int8 (ULTRA_V2_STREAM_INT8 quantized gather — per-row scales folded
    # into the weight column host-side) and converts on load
    cdt = tab_ref.dtype

    tl = tl_ref[pl.ds(row, 1), :][0]
    # the (C,) -> (C, 1) reshape must happen in f32 (Mosaic rejects the
    # 1-D bf16 relayout); weights ship as f32 rows for the same reason
    wcol = w_ref[pl.ds(row, 1), :][0][:, None].astype(cdt)
    xe = xe_ref[:].astype(cdt)
    if rel_gather:
        # same-shape in-kernel gather from the resident relation window
        idxr = jnp.broadcast_to(tl[:, None], (c, tab_ref.shape[1]))
        relg = jnp.take_along_axis(tab_ref[:], idxr, axis=0)
        m = xe * relg * wcol if mul_op == "mul" else (xe + relg) * wcol
    else:
        sel = _onehot(tl, tw, cdt)
        if mul_op == "mul":
            sel = sel * wcol         # fold w into the select: rows = w*rel[t]
        # Mosaic requires 32-bit matmul accumulators; cast the (exact)
        # one-hot selection back to the stream dtype for the elementwise
        # stage
        relg = jnp.dot(sel, tab_ref[:], preferred_element_type=jnp.float32,
                       precision=prec).astype(cdt)
        m = xe * relg if mul_op == "mul" else (xe + relg) * wcol

    # fold-8: banded constant (C/8, C) matmul — MXU-native, no sublane
    # relayout (a reshape(.,8,F).sum(1) lowers to slow strided selects)
    rowsi = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 1)
    fold = (cols // FOLD == rowsi).astype(cdt)
    slot = jnp.dot(fold, m, preferred_element_type=jnp.float32, precision=prec)
    scratch[pl.ds(jax.lax.rem(k, g) * nslot, nslot), :] = slot

    @pl.when(jax.lax.rem(k, g) == g - 1)
    def _flush():
        g2 = k // g                  # flush-group id
        @pl.when((g2 == 0) | (blk_ref[g2] != blk_ref[jnp.maximum(g2 - 1, 0)]))
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        k2row = jax.lax.rem(g2, 8)
        lred = k2l_ref[pl.ds(k2row, 1), :][0]
        s = _onehot(lred, rb2, jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            s, scratch[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )


def rspmm_v2_fwd(
    plan: PlanV2,
    relation: jax.Array,   # (R, F) flattened features
    x: jax.Array,          # (V, F)
    edge_weight_ext: jax.Array,  # (graph_E_pad + 1,) with 0.0 appended
    *,
    mul: str = "mul",
    out_rows: Optional[int] = None,
    f_block: int = 512,
    precision=None,
    int8_ok: bool = True,
) -> jax.Array:
    """Sum-aggregation forward via gather + fused fold/reduce kernel.

    ``int8_ok=False`` disables the env-gated STREAM_INT8 quantized-stream
    path regardless of the flag — gradient call sites (the d_x backward
    reuses this forward with src/dst swapped) must pass it so the
    custom-VJP pair stays numerically consistent when the eval-only
    probe flag is set in a training process."""
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    if plan.num_chunks == 0:
        return jnp.zeros((rows, f), jnp.float32)
    fs = _f_slice_width(plan.e_pad, f)
    if fs < f:  # wide batch: independent feature slices, bounded HBM
        return jnp.concatenate(
            [
                rspmm_v2_fwd(
                    plan, relation[:, s:s + fs], x[:, s:s + fs],
                    edge_weight_ext, mul=mul, out_rows=out_rows,
                    f_block=f_block, precision=precision, int8_ok=int8_ok,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk = min(f_block, f)
    if f % f_blk:
        # largest lane-aligned divisor of f (e.g. F = 14*64 = 896 -> 128);
        # fall back to one full-width block for odd small widths
        f_blk = next(
            (d for d in range(f_blk - f_blk % 128, 0, -128) if f % d == 0), f
        )
    nf = f // f_blk
    prec = _prec(precision)
    # bf16 stream halves the gather traffic and matches the v1 default
    # MXU bf16-pass numerics; 'highest' keeps full f32 end to end.
    # Interpret mode (CPU tests) stays f32 — same exactness contract as v1,
    # whose interpreted matmuls never truncate to bf16.
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    r_pad = max(_round_up(relation.shape[0], 8), 8)
    rel_pad = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    w_p = jnp.take(edge_weight_ext, plan.perm, axis=0)             # (E_pad,)
    int8_stream = (
        STREAM_INT8 and int8_ok and mul == "mul" and prec is None
        and not plan.rel_gather
    )
    if int8_stream:
        # quantized gather stream probe (eval-only, env-gated): per-row
        # symmetric int8 halves the stream's HBM write + kernel re-read;
        # the row scale folds exactly into the edge weight
        # (x*rel*w == (x/s)*rel*(w*s[src])), so the kernel just converts
        # int8 -> bf16 on load. mul='mul' only (additive messages cannot
        # fold the scale).
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12) / 127.0  # (V,)
        xq = jnp.clip(jnp.rint(x / s[:, None]), -127, 127).astype(jnp.int8)
        x_e = jnp.take(jax.lax.optimization_barrier(xq), plan.src_p, axis=0)
        w_p = w_p * jnp.take(s, plan.src_p, axis=0)
    else:
        # barrier: materialize the bf16 cast BEFORE the gather so the
        # gather engine reads 1KB rows, not 2KB f32 rows with a fused cast
        # (measured ~6% faster, scripts/exp_gather_cast.py)
        x_e = jnp.take(
            jax.lax.optimization_barrier(x.astype(stream_dt)), plan.src_p,
            axis=0,
        )  # (E_pad, F)
    if plan.rel_gather:
        tabs = jnp.pad(
            rel_pad.astype(stream_dt), ((0, plan.tw - r_pad), (0, 0))
        )
    else:
        tabs = jnp.take(rel_pad.astype(stream_dt), plan.table_ids, axis=0)

    k, c = plan.num_chunks, plan.chunk
    gsz = ALIGN // c  # chunks per flush group
    assert k == gsz * plan.k2_chunks, (k, gsz, plan.k2_chunks)
    # weights stay f32: a (1, C) dynamic-row load from a bf16 (8, C) block
    # violates Mosaic's 16-sublane bf16 tiling; the kernel casts per chunk
    w_kc = _pad8(w_p.reshape(k, c))
    tl = _pad8(plan.type_local)

    out_c = pl.pallas_call(
        functools.partial(
            _fused_kernel, mul, plan.rel_gather, c, gsz, plan.tw, plan.rb2,
            prec,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # weights
                pl.BlockSpec(
                    (8, ALIGN // FOLD),
                    lambda j, k, g, b: (k // (8 * gsz), 0)),             # k2_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),     # x_e
                pl.BlockSpec((plan.tw, f_blk), lambda j, k, g, b: (g[k], j)),  # table
            ],
            out_specs=pl.BlockSpec(
                (plan.rb2, f_blk), lambda j, k, g, b: (b[k // gsz], j)
            ),
            scratch_shapes=[pltpu.VMEM((ALIGN // FOLD, f_blk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_compact_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            **_vmem_limit_kw(),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.k2_blk, tl, w_kc, _pad8(plan.k2_local), x_e, tabs)

    out_ext = jnp.concatenate([out_c, jnp.zeros((1, f), out_c.dtype)])
    return jnp.take(out_ext, jnp.minimum(plan.rank[:rows], plan.n_compact_pad),
                    axis=0)


_MMFILL = 1e38  # finite min/max identity (matches rspmm_pallas._MINMAX_FILL)


def _minmax_kernel_v2(mul_op, is_min, c, g, tw, rb2, prec,
                      group_ref, blk_ref, tl_ref, w_ref, dstl_ref, xe_ref,
                      tab_ref, out_ref):
    """min/max aggregation over the gathered dst-major stream: clustered
    relation select (MXU) + message (VPU) + run-segmented Hillis-Steele
    scan over the chunk's edges + select-last one-hot into the resident
    compact-dst block with min/max combine (the v1 _minmax_kernel's scan,
    fed by the XLA gather instead of a one-hot gather matmul). Requires a
    sort_slots=False plan (dst runs contiguous)."""
    k = pl.program_id(1)
    fill = _MMFILL if is_min else -_MMFILL
    row = jax.lax.rem(k, 8)
    cdt = xe_ref.dtype

    # blk_ref rows are per ALIGN-edge flush group (g chunks per group)
    @pl.when(
        (k == 0) | (blk_ref[k // g] != blk_ref[jnp.maximum(k - 1, 0) // g])
    )
    def _init():
        out_ref[:] = jnp.full_like(out_ref, fill)

    tl = tl_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0]
    lred = dstl_ref[pl.ds(row, 1), :][0]
    sel_t = _onehot(tl, tw, cdt)
    relg = jnp.dot(sel_t, tab_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    xe = xe_ref[:].astype(jnp.float32)
    msg = xe * relg if mul_op == "mul" else xe + relg
    msg = msg * w[:, None]
    live2 = w[:, None] != 0.0
    msg = jnp.where(live2, msg, fill)
    comb = jnp.minimum if is_min else jnp.maximum

    # phase 1 — intra-slot (8 edges, one dst each): 3 scan steps with a
    # STATIC mask (every row of a slot shares the dst by construction).
    # A flat log2(c)-step chunk scan measured a wash vs v1 (10 full-width
    # VPU passes); the slot hierarchy cuts that to 3 full + 7 narrow.
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    for shift in (1, 2, 4):
        rolled = pltpu.roll(msg, shift, 0)
        msg = comb(
            msg, jnp.where(jax.lax.rem(idx2, FOLD) >= shift, rolled, fill)
        )
    # slot totals sit at each slot's last row; a banded one-select matmul
    # (sum over exactly one element) extracts them without a sublane
    # relayout. The same pick applied to the (exact small-int) dst ids
    # yields slot-level segment ids.
    nslot = c // FOLD
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 1)
    pick = (cols_s == rows_s * FOLD + (FOLD - 1)).astype(jnp.float32)
    slot_msg = jnp.dot(pick, msg, preferred_element_type=jnp.float32,
                       precision=prec)                       # (nslot, F)
    # ids must survive exactly (odd ids > 256 misround under the bf16
    # pass) — force the exact multi-pass mode for this tiny matmul
    slot_dst2 = jnp.dot(
        pick, lred[:, None].astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)                                      # (nslot, 1)

    # phase 2 — slot-level segmented scan (dst runs are slot-contiguous
    # with sort_slots=False), then select-last per dst into the block
    sidx2 = jax.lax.broadcasted_iota(jnp.int32, (nslot, 1), 0)
    shift = 1
    while shift < nslot:
        rolled = pltpu.roll(slot_msg, shift, 0)
        dst_rolled = pltpu.roll(slot_dst2, shift, 0)
        same2 = (sidx2 >= shift) & (dst_rolled == slot_dst2)
        slot_msg = comb(slot_msg, jnp.where(same2, rolled, fill))
        shift *= 2

    dst_next = pltpu.roll(slot_dst2, nslot - 1, 0)
    is_last2 = (dst_next != slot_dst2) | (sidx2 == nslot - 1)
    is_last_f = jnp.where(is_last2, 1.0, 0.0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (nslot, rb2), 1)
    sel = (cols_r == slot_dst2).astype(jnp.float32) * is_last_f
    cand = jax.lax.dot_general(
        sel, jnp.where(is_last2, slot_msg, 0.0),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    has = jax.lax.dot_general(
        sel, jnp.ones((nslot, 1), jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.where(has > 0, comb(out_ref[:], cand), out_ref[:])


def rspmm_v2_minmax(
    plan: PlanV2,
    relation: jax.Array,
    x: jax.Array,
    edge_weight_ext: jax.Array,
    *,
    mul: str = "mul",
    is_min: bool = False,
    out_rows: Optional[int] = None,
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """min/max-aggregation forward on the v2 gather+fold layout. Rows with
    no live edges hold +/-inf (the XLA-path convention; callers fold the
    boundary with min/max). Primal/eval path only — the custom VJP keeps
    the v1 fwd+bwd pair under differentiation so tie routing compares
    bit-identical values."""
    assert not plan.sorted_slots, "min/max needs a sort_slots=False plan"
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    fill_inf = jnp.inf if is_min else -jnp.inf
    if plan.num_chunks == 0:
        return jnp.full((rows, f), fill_inf, jnp.float32)
    fs = _f_slice_width(plan.e_pad, f)
    if fs < f:
        return jnp.concatenate(
            [
                rspmm_v2_minmax(
                    plan, relation[:, s:s + fs], x[:, s:s + fs],
                    edge_weight_ext, mul=mul, is_min=is_min,
                    out_rows=out_rows, f_block=f_block, precision=precision,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk = min(f_block, f)
    if f % f_blk:
        f_blk = next(
            (d for d in range(f_blk - f_blk % 128, 0, -128) if f % d == 0), f
        )
    nf = f // f_blk
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    r_pad = max(_round_up(relation.shape[0], 8), 8)
    rel_pad = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    x_e = jnp.take(
        jax.lax.optimization_barrier(x.astype(stream_dt)), plan.src_p, axis=0
    )
    tabs = jnp.take(rel_pad.astype(stream_dt), plan.table_ids, axis=0)
    w_p = jnp.take(edge_weight_ext, plan.perm, axis=0)

    k, c = plan.num_chunks, plan.chunk
    fill = _MMFILL if is_min else -_MMFILL

    out_c = pl.pallas_call(
        functools.partial(
            _minmax_kernel_v2, mul, is_min, c, ALIGN // c, plan.tw,
            plan.rb2, prec
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),  # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),  # weights
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),  # dst_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),   # x_e
                pl.BlockSpec((plan.tw, f_blk), lambda j, k, g, b: (g[k], j)),
            ],
            out_specs=pl.BlockSpec(
                (plan.rb2, f_blk), lambda j, k, g, b: (b[k // (ALIGN // c)], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_compact_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.k2_blk, _pad8(plan.type_local),
      _pad8(w_p.reshape(k, c)), _pad8(plan.dst_local), x_e, tabs)

    out_ext = jnp.concatenate(
        [out_c, jnp.full((1, f), fill, out_c.dtype)]
    )
    out = jnp.take(
        out_ext, jnp.minimum(plan.rank[:rows], plan.n_compact_pad), axis=0
    )
    sign = 1.0 if is_min else -1.0
    return jnp.where(out == sign * _MMFILL, sign * jnp.inf, out)


def _expand_block_rows(lred, blk_ref, c, rb2, prec, cdt):
    """Expand resident compact-block rows to edges: slot rows via a one-hot
    over the slot ids, then the fold band transposed (same trick as the
    rel-grad kernel). Row selects accumulate in f32, so values pass through
    EXACTLY (the resident blocks are pre-cast to the stream dtype outside).
    ``lred``: (nslot,) slot ids in [0, rb2]; returns (c, F) rows."""
    nslot = c // FOLD
    sel_g = _onehot(lred, rb2, cdt)                      # (nslot, rb2)
    slot_rows = jnp.dot(sel_g, blk_ref[:], preferred_element_type=jnp.float32,
                        precision=prec).astype(cdt)      # (nslot, F)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (c, nslot), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (c, nslot), 1)
    expand = (rows_c // FOLD == cols_s).astype(cdt)
    return jnp.dot(expand, slot_rows, preferred_element_type=jnp.float32,
                   precision=prec)                        # (c, F) f32


def _minmax_route(mul_op, cdt, xe, relg, wcol, out_e):
    """Tie routing for min/max backward: recompute the message exactly as
    the v2 forward and compare in the stream dtype. At 'highest'/interpret
    (cdt f32) this is the exact reference semantics (operator.cuh:62-77,
    every tying edge routed); at the default bf16 pass both sides truncate
    identically, so the true winner always routes (v1's asymmetric compare
    could drop it) at the cost of occasionally routing bf16-collided
    near-ties too."""
    m = xe * relg if mul_op == "mul" else xe + relg       # f32, fwd-identical
    # round both sides to the stream dtype, then COMPARE IN f32: a bf16
    # cmpf (vector<8x128x2xbf16> -> i1) hits Mosaic's "Invalid relayout
    # ... replicated in destination" on-chip; bf16->f32 is exact, so the
    # symmetric-truncation tie semantics are unchanged
    lhs = (m * wcol).astype(cdt).astype(jnp.float32)
    rhs = out_e.astype(cdt).astype(jnp.float32)
    eq = (lhs == rhs).astype(jnp.float32)
    live2 = (wcol != 0.0).astype(jnp.float32)              # (c, 1) f32
    return m, eq * live2


def _minmax_dx_kernel_v2(mul_op, c, g, tw, rb2, prec,
                         group_ref, blk_ref, tl_ref, w_ref, k2l_ref,
                         ge_ref, oute_ref, tab_ref, xc_ref,
                         out_ref, scratch):
    """min/max input-grad on the SRC-SWAPPED gather+fold layout: per edge
    d_x[src] += route * w * (rel[t] if mul else 1) * g[dst], summed by the
    standard fold+flush (sum aggregation — routed grads add). Streams carry
    g[dst] and out[dst] (the swapped plan's gather side); x[src] comes from
    the resident compact block (the swapped reduce side — the same rows the
    output block covers)."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    nslot = c // FOLD
    cdt = ge_ref.dtype

    tl = tl_ref[pl.ds(row, 1), :][0]
    wcol = w_ref[pl.ds(row, 1), :][0][:, None]            # f32
    lred = k2l_ref[
        pl.ds(jax.lax.rem(k // g, 8), 1),
        pl.ds(jax.lax.rem(k, g) * nslot, nslot),
    ][0]
    sel = _onehot(tl, tw, cdt)
    relg = jnp.dot(sel, tab_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)                        # (c, F) exact rows
    xe = _expand_block_rows(lred, xc_ref, c, rb2, prec, cdt)
    _, route = _minmax_route(mul_op, cdt, xe, relg, wcol,
                             oute_ref[:].astype(jnp.float32))
    contrib = route * wcol * ge_ref[:].astype(jnp.float32)
    if mul_op == "mul":
        contrib = contrib * relg

    rowsi = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nslot, c), 1)
    fold = (cols // FOLD == rowsi).astype(cdt)
    slot = jnp.dot(fold, contrib.astype(cdt),
                   preferred_element_type=jnp.float32, precision=prec)
    scratch[pl.ds(jax.lax.rem(k, g) * nslot, nslot), :] = slot

    @pl.when(jax.lax.rem(k, g) == g - 1)
    def _flush():
        g2 = k // g
        @pl.when((g2 == 0) | (blk_ref[g2] != blk_ref[jnp.maximum(g2 - 1, 0)]))
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        k2row = jax.lax.rem(g2, 8)
        lred2 = k2l_ref[pl.ds(k2row, 1), :][0]
        s = _onehot(lred2, rb2, jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            s, scratch[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )


def _minmax_drel_kernel_v2(mul_op, c, g, tw, rb2, prec,
                           group_ref, blk_ref, tl_ref, w_ref, k2l_ref,
                           xe_ref, tab_ref, gc_ref, outc_ref, out_ref):
    """min/max relation-grad on the dst-major layout: d_tab[tl_e] +=
    route * w * (x[src] if mul else 1) * g[dst]; g and out rows expand from
    the resident compact-dst blocks (no extra HBM gathers)."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    nslot = c // FOLD
    cdt = xe_ref.dtype

    tl = tl_ref[pl.ds(row, 1), :][0]
    wcol = w_ref[pl.ds(row, 1), :][0][:, None]
    lred = k2l_ref[
        pl.ds(jax.lax.rem(k // g, 8), 1),
        pl.ds(jax.lax.rem(k, g) * nslot, nslot),
    ][0]
    sel = _onehot(tl, tw, cdt)
    relg = jnp.dot(sel, tab_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    xe = xe_ref[:].astype(jnp.float32)
    g_e = _expand_block_rows(lred, gc_ref, c, rb2, prec, cdt)
    out_e = _expand_block_rows(lred, outc_ref, c, rb2, prec, cdt)
    _, route = _minmax_route(mul_op, cdt, xe, relg, wcol, out_e)
    contrib = route * wcol * g_e
    if mul_op == "mul":
        contrib = contrib * xe
    sel_t = _onehot(tl, tw, jnp.float32)

    @pl.when((k == 0) | (group_ref[k] != group_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        sel_t, contrib.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _drel_add_kernel(c, g, tw, rb2, prec,
                     group_ref, blk_ref, tl_ref, w_ref, k2l_ref, gc_ref,
                     out_ref):
    """Sum-aggregation transe relation-grad: d_tab[tl_e] += w_e * g[dst_e]
    — no x stream at all (the message derivative wrt rel is 1), so the only
    HBM traffic is metadata + the resident grad blocks."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    nslot = c // FOLD
    cdt = gc_ref.dtype

    tl = tl_ref[pl.ds(row, 1), :][0]
    wcol = w_ref[pl.ds(row, 1), :][0][:, None]
    lred = k2l_ref[
        pl.ds(jax.lax.rem(k // g, 8), 1),
        pl.ds(jax.lax.rem(k, g) * nslot, nslot),
    ][0]
    g_e = _expand_block_rows(lred, gc_ref, c, rb2, prec, cdt)
    prod = (g_e * wcol).astype(cdt)
    sel_t = _onehot(tl, tw, jnp.float32)

    @pl.when((k == 0) | (group_ref[k] != group_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        sel_t, prod,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _drel_kernel(c, g, tw, rb2, prec,
                 group_ref, blk_ref, tl_ref, w_ref, k2l_ref, xe_ref, gc_ref,
                 out_ref):
    """Relation gradient over the same dst-major edge layout:
    d_tab[tl_e] += w_e * x_e ⊙ g[dst_e], with g[dst] expanded from the
    VMEM-resident compact-dst block (no second HBM gather): slot rows via a
    one-hot over k2_local, edges via the fold band transposed. Output is
    the per-group local table block (tw, F), revisited per group run."""
    k = pl.program_id(1)
    row = jax.lax.rem(k, 8)
    nslot = c // FOLD
    cdt = xe_ref.dtype

    tl = tl_ref[pl.ds(row, 1), :][0]
    wcol = w_ref[pl.ds(row, 1), :][0][:, None].astype(cdt)
    lred = k2l_ref[
        pl.ds(jax.lax.rem(k // g, 8), 1),
        pl.ds(jax.lax.rem(k, g) * nslot, nslot),
    ][0]
    sel_g = _onehot(lred, rb2, cdt)                     # (nslot, rb2)
    slot_g = jnp.dot(sel_g, gc_ref[:], preferred_element_type=jnp.float32,
                     precision=prec).astype(cdt)        # (nslot, F)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (c, nslot), 0)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (c, nslot), 1)
    expand = (rows_c // FOLD == cols_s).astype(cdt)     # fold band transposed
    g_e = jnp.dot(expand, slot_g, preferred_element_type=jnp.float32,
                  precision=prec).astype(cdt)           # (c, F)
    prod = xe_ref[:] * wcol * g_e
    sel_t = _onehot(tl, tw, jnp.float32)                # (c, tw)

    @pl.when((k == 0) | (group_ref[k] != group_ref[jnp.maximum(k - 1, 0)]))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        sel_t, prod,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def rspmm_v2_drel(
    plan: PlanV2,
    x: jax.Array,            # (V, F)
    grad: jax.Array,         # (V, F) upstream gradient over output nodes
    edge_weight_ext: jax.Array,
    num_rel_rows: int,
    *,
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """d_rel[t] = sum_e w_e * x[src_e] * grad[dst_e]  (distmult/mul only —
    the add/transe rel-grad does not need the x stream and stays on the v1
    kernel). Same gather+fold layout as the forward; grad rows come from
    the resident compact-dst block instead of a second gather."""
    n, f = x.shape
    if plan.num_chunks == 0:
        return jnp.zeros((num_rel_rows, f), jnp.float32)
    fs = _f_slice_width(plan.e_pad, f)
    if fs < f:
        return jnp.concatenate(
            [
                rspmm_v2_drel(
                    plan, x[:, s:s + fs], grad[:, s:s + fs], edge_weight_ext,
                    num_rel_rows, f_block=f_block, precision=precision,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk = min(f_block, f)
    if f % f_blk:
        f_blk = next(
            (d for d in range(f_blk - f_blk % 128, 0, -128) if f % d == 0), f
        )
    nf = f // f_blk
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    x_e = jnp.take(
        jax.lax.optimization_barrier(x.astype(stream_dt)), plan.src_p, axis=0
    )  # (E_pad, F)
    g_c = jnp.take(grad.astype(stream_dt), plan.present, axis=0)   # (n_c_pad, F)
    w_p = jnp.take(edge_weight_ext, plan.perm, axis=0)

    k, c = plan.num_chunks, plan.chunk
    gsz = ALIGN // c
    w_kc = _pad8(w_p.reshape(k, c))
    tl = _pad8(plan.type_local)

    out_tab = pl.pallas_call(
        functools.partial(_drel_kernel, c, gsz, plan.tw, plan.rb2, prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # weights
                pl.BlockSpec(
                    (8, ALIGN // FOLD),
                    lambda j, k, g, b: (k // (8 * gsz), 0)),             # k2_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),     # x_e
                pl.BlockSpec((plan.rb2, f_blk),
                             lambda j, k, g, b: (b[k // gsz], j)),       # g block
            ],
            out_specs=pl.BlockSpec(
                (plan.tw, f_blk), lambda j, k, g, b: (g[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_groups * plan.tw, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.k2_blk, tl, w_kc, _pad8(plan.k2_local), x_e, g_c)

    # local tables -> global relation rows (a tiny one-hot contraction; the
    # same type may appear in several groups and sums correctly). tab_valid
    # zeroes rows of pad groups no chunk ever writes (uninitialized memory
    # after cross-shard plan padding — a where, not a multiply, so garbage
    # NaNs cannot leak through).
    return _tables_to_rel_rows(plan, out_tab, num_rel_rows)


def _tables_to_rel_rows(plan: PlanV2, out_tab: jax.Array, num_rel_rows: int):
    out_tab = jnp.where(plan.tab_valid[:, None] > 0, out_tab, 0.0)
    r_pad = max(_round_up(num_rel_rows, 8), 8)
    sel = _onehot(plan.table_ids, r_pad, jnp.float32)   # (n_tab, r_pad)
    out = jax.lax.dot_general(
        sel, out_tab,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out[:num_rel_rows]


def _f_blocking(f: int, f_block: int):
    f_blk = min(f_block, f)
    if f % f_blk:
        f_blk = next(
            (d for d in range(f_blk - f_blk % 128, 0, -128) if f % d == 0), f
        )
    return f_blk, f // f_blk


def rspmm_v2_drel_add(
    plan: PlanV2,
    grad: jax.Array,          # (V, F) upstream gradient over output nodes
    edge_weight_ext: jax.Array,
    num_rel_rows: int,
    *,
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """Sum-aggregation transe relation gradient d_rel[t] = sum_e w_e *
    grad[dst_e] on the gather+fold layout — replaces the v1 one-hot
    rel-grad for mul='add' (rspmm.cpp:106-114 relation_grad with
    d/drel = 1). No edge stream: grad rows expand from the resident
    compact-dst blocks."""
    n, f = grad.shape
    if plan.num_chunks == 0:
        return jnp.zeros((num_rel_rows, f), jnp.float32)
    fs = _f_slice_width(plan.e_pad, f)
    if fs < f:
        return jnp.concatenate(
            [
                rspmm_v2_drel_add(
                    plan, grad[:, s:s + fs], edge_weight_ext, num_rel_rows,
                    f_block=f_block, precision=precision,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk, nf = _f_blocking(f, f_block)
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )
    g_c = jnp.take(grad.astype(stream_dt), plan.present, axis=0)
    w_p = jnp.take(edge_weight_ext, plan.perm, axis=0)

    k, c = plan.num_chunks, plan.chunk
    gsz = ALIGN // c
    out_tab = pl.pallas_call(
        functools.partial(_drel_add_kernel, c, gsz, plan.tw, plan.rb2, prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # weights
                pl.BlockSpec(
                    (8, ALIGN // FOLD),
                    lambda j, k, g, b: (k // (8 * gsz), 0)),             # k2_local
                pl.BlockSpec((plan.rb2, f_blk),
                             lambda j, k, g, b: (b[k // gsz], j)),       # g block
            ],
            out_specs=pl.BlockSpec(
                (plan.tw, f_blk), lambda j, k, g, b: (g[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_groups * plan.tw, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.k2_blk, _pad8(plan.type_local),
      _pad8(w_p.reshape(k, c)), _pad8(plan.k2_local), g_c)
    return _tables_to_rel_rows(plan, out_tab, num_rel_rows)


def rspmm_v2_minmax_dx(
    plan_src: PlanV2,         # the SRC-SWAPPED plan (reduce side = src)
    relation: jax.Array,      # (R, F)
    grad: jax.Array,          # (V, F) cotangent by dst
    out_fwd: jax.Array,       # (V, F) saved v2 forward (finite-fill form)
    x: jax.Array,             # (V, F) forward input
    edge_weight_ext: jax.Array,
    *,
    mul: str = "mul",
    out_rows: Optional[int] = None,
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """min/max input gradient on the v2 layout: d_x[src] = sum over routed
    edges of w * (rel[t] if mul else 1) * grad[dst]; routing recomputes the
    v2 forward's message exactly (operator.cuh:62-77: all tying edges
    route). Streams carry grad/out by dst; x rows come from the resident
    compact block (same rows as the output block)."""
    n, f = x.shape
    rows = out_rows if out_rows is not None else n
    if plan_src.num_chunks == 0:
        return jnp.zeros((rows, f), jnp.float32)
    fs = _f_slice_width(2 * plan_src.e_pad, f)  # two streams materialize
    if fs < f:
        return jnp.concatenate(
            [
                rspmm_v2_minmax_dx(
                    plan_src, relation[:, s:s + fs], grad[:, s:s + fs],
                    out_fwd[:, s:s + fs], x[:, s:s + fs], edge_weight_ext,
                    mul=mul, out_rows=out_rows, f_block=f_block,
                    precision=precision,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk, nf = _f_blocking(f, f_block)
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    r_pad = max(_round_up(relation.shape[0], 8), 8)
    rel_pad = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    tabs = jnp.take(rel_pad.astype(stream_dt), plan_src.table_ids, axis=0)
    g_e = jnp.take(
        jax.lax.optimization_barrier(grad.astype(stream_dt)),
        plan_src.src_p, axis=0,
    )
    out_e = jnp.take(
        jax.lax.optimization_barrier(out_fwd.astype(stream_dt)),
        plan_src.src_p, axis=0,
    )
    x_c = jnp.take(x.astype(stream_dt), plan_src.present, axis=0)
    w_p = jnp.take(edge_weight_ext, plan_src.perm, axis=0)

    k, c = plan_src.num_chunks, plan_src.chunk
    gsz = ALIGN // c
    out_c = pl.pallas_call(
        functools.partial(
            _minmax_dx_kernel_v2, mul, c, gsz, plan_src.tw, plan_src.rb2, prec
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # weights
                pl.BlockSpec(
                    (8, ALIGN // FOLD),
                    lambda j, k, g, b: (k // (8 * gsz), 0)),             # k2_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),     # g_e
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),     # out_e
                pl.BlockSpec((plan_src.tw, f_blk),
                             lambda j, k, g, b: (g[k], j)),              # table
                pl.BlockSpec((plan_src.rb2, f_blk),
                             lambda j, k, g, b: (b[k // gsz], j)),       # x block
            ],
            out_specs=pl.BlockSpec(
                (plan_src.rb2, f_blk), lambda j, k, g, b: (b[k // gsz], j)
            ),
            scratch_shapes=[pltpu.VMEM((ALIGN // FOLD, f_blk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((plan_src.n_compact_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan_src.group_id, plan_src.k2_blk, _pad8(plan_src.type_local),
      _pad8(w_p.reshape(k, c)), _pad8(plan_src.k2_local),
      g_e, out_e, tabs, x_c)

    out_ext = jnp.concatenate([out_c, jnp.zeros((1, f), out_c.dtype)])
    return jnp.take(
        out_ext, jnp.minimum(plan_src.rank[:rows], plan_src.n_compact_pad),
        axis=0,
    )


def rspmm_v2_minmax_drel(
    plan: PlanV2,             # the dst-major plan
    x: jax.Array,             # (V, F) forward input
    grad: jax.Array,          # (V, F) cotangent by dst
    out_fwd: jax.Array,       # (V, F) saved forward (finite-fill form)
    edge_weight_ext: jax.Array,
    num_rel_rows: int,
    relation: jax.Array,      # (R, F) — needed to recompute the message
    *,
    mul: str = "mul",
    f_block: int = 512,
    precision=None,
) -> jax.Array:
    """min/max relation gradient on the v2 layout: d_rel[t] = sum over
    routed edges of w * (x[src] if mul else 1) * grad[dst]. The x stream is
    required even for transe (routing needs the recomputed message); grad
    and out rows expand from the resident compact-dst blocks."""
    n, f = x.shape
    if plan.num_chunks == 0:
        return jnp.zeros((num_rel_rows, f), jnp.float32)
    fs = _f_slice_width(plan.e_pad, f)
    if fs < f:
        return jnp.concatenate(
            [
                rspmm_v2_minmax_drel(
                    plan, x[:, s:s + fs], grad[:, s:s + fs],
                    out_fwd[:, s:s + fs], edge_weight_ext, num_rel_rows,
                    relation[:, s:s + fs], mul=mul, f_block=f_block,
                    precision=precision,
                )
                for s in range(0, f, fs)
            ],
            axis=1,
        )
    f_blk, nf = _f_blocking(f, f_block)
    prec = _prec(precision)
    stream_dt = (
        jnp.float32 if (prec is not None or _interpret()) else jnp.bfloat16
    )

    r_pad = max(_round_up(relation.shape[0], 8), 8)
    rel_pad = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    tabs = jnp.take(rel_pad.astype(stream_dt), plan.table_ids, axis=0)
    x_e = jnp.take(
        jax.lax.optimization_barrier(x.astype(stream_dt)), plan.src_p, axis=0
    )
    g_c = jnp.take(grad.astype(stream_dt), plan.present, axis=0)
    out_c = jnp.take(out_fwd.astype(stream_dt), plan.present, axis=0)
    w_p = jnp.take(edge_weight_ext, plan.perm, axis=0)

    k, c = plan.num_chunks, plan.chunk
    gsz = ALIGN // c
    out_tab = pl.pallas_call(
        functools.partial(
            _minmax_drel_kernel_v2, mul, c, gsz, plan.tw, plan.rb2, prec
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, k),
            in_specs=[
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # type_local
                pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),    # weights
                pl.BlockSpec(
                    (8, ALIGN // FOLD),
                    lambda j, k, g, b: (k // (8 * gsz), 0)),             # k2_local
                pl.BlockSpec((c, f_blk), lambda j, k, g, b: (k, j)),     # x_e
                pl.BlockSpec((plan.tw, f_blk), lambda j, k, g, b: (g[k], j)),
                pl.BlockSpec((plan.rb2, f_blk),
                             lambda j, k, g, b: (b[k // gsz], j)),       # g block
                pl.BlockSpec((plan.rb2, f_blk),
                             lambda j, k, g, b: (b[k // gsz], j)),       # out block
            ],
            out_specs=pl.BlockSpec(
                (plan.tw, f_blk), lambda j, k, g, b: (g[k], j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((plan.n_groups * plan.tw, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(plan.group_id, plan.k2_blk, _pad8(plan.type_local),
      _pad8(w_p.reshape(k, c)), _pad8(plan.k2_local),
      x_e, tabs, g_c, out_c)
    return _tables_to_rel_rows(plan, out_tab, num_rel_rows)
