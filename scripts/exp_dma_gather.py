"""Round-3 gather probes: can the v2 kernel's materialized XLA gather be
replaced by an in-kernel mechanism? (VERDICT r2 #1)

The materialized-gather pipeline pays the (E_pad, F) stream three times
(random read + write + re-read) and caps at ~255 M edges/s (ROOFLINE.md).
Round-2 probes closed jnp.take / shape-changing take_along_axis /
dynamic_slice loops / full-V one-hot. This round probes the forms those
missed:

  A. per-row DMA gather: x in ANY memory space, per-chunk indices in SMEM,
     the kernel issues one async row copy per edge (the judge's literal
     'scalar-prefetched indices driving double-buffered HBM->VMEM copies').
     Expected issue-rate bound — this measures ns/DMA definitively.
  B. SAME-SHAPE dynamic_gather, sublane axis: Mosaic's gather lowering
     accepts take_along_axis(x, idx, axis=0) when operand/indices/output
     all have shape (C, F) (out[i, j] = x[idx[i, j], j]) — the round-2
     probes only tried shape-changing gathers, which that rule rejects.
     Probed at C = 128 / 1024 / 2048.
  C. same-shape dynamic_gather on the LANE axis: out[i, j] = x[i, idx[i, j]]
     with a (M, 128) operand — a VPU lane shuffle if it lowers.
  D. the windowed design: scalar-prefetched per-chunk window ids drive the
     normal Pallas input pipeline (BlockSpec index_map -> double-buffered
     window DMA), in-kernel same-shape gather (B) selects rows within the
     window. One HBM read per window instead of 3x stream — if B lowers,
     this is the v3 forward's skeleton.

Usage: python scripts/exp_dma_gather.py   (on the TPU; results to stderr)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMOKE = os.environ.get("DMA_PROBE_SMOKE", "") == "1"  # CPU shape check
if SMOKE:
    V, F, E, V_PAD = 120, 256, 4096, 128
else:
    V, F = 14541, 512
    E = 616448
    V_PAD = 14592


def _interp():
    return jax.default_backend() not in ("tpu", "axon")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fj, *args, iters=8):
    def chain(n):
        def step(c):
            o = fj(*args)
            return c + jnp.sum(o[0].astype(jnp.float32)) * 1e-30
        return jax.jit(
            lambda c: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)
        )
    c1, cn = chain(1), chain(iters)
    float(c1(jnp.zeros(()))); float(cn(jnp.zeros(())))
    t0 = time.perf_counter(); float(c1(jnp.zeros(()))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(cn(jnp.zeros(()))); tn = time.perf_counter() - t0
    return max(tn - t1, 1e-9) / (iters - 1) * 1e3


# --- A: per-row DMA gather ---------------------------------------------------


def kernel_dma(idx_ref, x_any, o_ref, sems):
    c = o_ref.shape[0]
    for i in range(c):
        pltpu.make_async_copy(
            x_any.at[pl.ds(idx_ref[0, i], 1), :],
            o_ref.at[pl.ds(i, 1), :],
            sems.at[i],
        ).start()
    for i in range(c):
        pltpu.make_async_copy(
            x_any.at[pl.ds(idx_ref[0, i], 1), :],
            o_ref.at[pl.ds(i, 1), :],
            sems.at[i],
        ).wait()


def probe_dma(xb, idx, c=128, n_chunks=256):
    name = f"A:row-DMA c={c} ({n_chunks} chunks)"
    try:
        k = n_chunks
        idx_kc = jnp.asarray(idx[: k * c].reshape(k, c))
        f = pl.pallas_call(
            kernel_dma,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((c, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
            scratch_shapes=[pltpu.SemaphoreType.DMA((c,))],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        out = fj(idx_kc, xb)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(xb.astype(jnp.float32))[np.asarray(idx_kc[0])]
        err = np.abs(got - ref).max()
        ms = slope(fj, idx_kc, xb)
        rows = k * c
        log(f"{name}: {ms:.2f} ms for {rows} rows -> "
            f"{rows/(ms*1e-3)/1e6:.1f} M rows/s ({ms*1e6/rows:.0f} ns/row) "
            f"err={err:.1e}")
        return rows / (ms * 1e-3)
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


# --- B: same-shape sublane dynamic_gather ------------------------------------


def kernel_same_shape(idx_ref, w_ref, o_ref):
    c = o_ref.shape[0]
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    idx2d = jnp.broadcast_to(idx[:, None], (c, F))
    o_ref[:] = jnp.take_along_axis(w_ref[:], idx2d, axis=0)


def probe_same_shape(xb, rng, c):
    name = f"B:same-shape take_along_axis axis0 C={c}"
    try:
        k = max(8, (E // c) - (E // c) % 8)
        idx = rng.integers(0, c, size=(k, c)).astype(np.int32)
        n_win = V_PAD // c
        f = pl.pallas_call(
            kernel_same_shape,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((8, c), lambda i: (i // 8, 0)),
                pl.BlockSpec((c, F), lambda i, nw=n_win: (i % nw, 0)),
            ],
            out_specs=pl.BlockSpec((c, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        idx_j = jnp.asarray(idx)
        out = fj(idx_j, xb)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(xb[:c].astype(jnp.float32))[idx[0]]
        err = np.abs(got - ref).max()
        ms = slope(fj, idx_j, xb)
        rows = k * c
        log(f"{name}: {ms:.2f} ms for {rows} rows -> "
            f"{rows/(ms*1e-3)/1e6:.0f} M rows/s err={err:.1e}")
        return rows / (ms * 1e-3)
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


# --- C: lane-axis dynamic_gather ----------------------------------------------


def kernel_lane(idx_ref, w_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(w_ref[:], idx_ref[:], axis=1)


def probe_lane(rng):
    name = "C:same-shape take_along_axis axis1 (lane shuffle, 512x128)"
    try:
        m, lanes = 512, 128
        x = rng.normal(size=(m, lanes)).astype(np.float32)
        idx = rng.integers(0, lanes, size=(m, lanes)).astype(np.int32)
        k = 512
        f = pl.pallas_call(
            kernel_lane,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((m, lanes), lambda i: (0, 0)),
                pl.BlockSpec((m, lanes), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, lanes), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        out = fj(jnp.asarray(idx), jnp.asarray(x))
        got = np.asarray(out)
        ref = np.take_along_axis(x, idx, axis=1)
        err = np.abs(got - ref).max()
        ms = slope(fj, jnp.asarray(idx), jnp.asarray(x))
        elems = k * m * lanes
        log(f"{name}: {ms:.3f} ms for {k} calls -> "
            f"{elems/(ms*1e-3)/1e9:.1f} G elems/s err={err:.1e}")
        return True
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


# --- D: scalar-prefetched window + in-kernel gather ---------------------------


def kernel_windowed(win_ref, idx_ref, w_ref, o_ref):
    c = o_ref.shape[0]
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    idx2d = jnp.broadcast_to(idx[:, None], (c, F))
    o_ref[:] = jnp.take_along_axis(w_ref[:], idx2d, axis=0)


def probe_windowed(xb, rng, c=1024):
    name = f"D:windowed gather (scalar-prefetch window, C=W={c})"
    try:
        k = max(8, (E // c) - (E // c) % 8)
        n_win = V_PAD // c
        wins = rng.integers(0, n_win, size=(k,)).astype(np.int32)
        idx = rng.integers(0, c, size=(k, c)).astype(np.int32)
        f = pl.pallas_call(
            functools.partial(kernel_windowed),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(k,),
                in_specs=[
                    pl.BlockSpec((8, c), lambda i, w: (i // 8, 0)),
                    pl.BlockSpec((c, F), lambda i, w: (w[i], 0)),
                ],
                out_specs=pl.BlockSpec((c, F), lambda i, w: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        wins_j, idx_j = jnp.asarray(wins), jnp.asarray(idx)
        out = fj(wins_j, idx_j, xb)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(
            xb[wins[0] * c:(wins[0] + 1) * c].astype(jnp.float32))[idx[0]]
        err = np.abs(got - ref).max()
        ms = slope(fj, wins_j, idx_j, xb)
        rows = k * c
        log(f"{name}: {ms:.2f} ms for {rows} rows -> "
            f"{rows/(ms*1e-3)/1e6:.0f} M rows/s err={err:.1e}")
        return rows / (ms * 1e-3)
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(V_PAD, F)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    idx_flat = rng.integers(0, V, size=(E,)).astype(np.int32)

    # XLA gather baseline for scale
    flat = jnp.asarray(idx_flat)
    gfun = jax.jit(lambda x_, i_: jnp.take(x_, i_, axis=0))
    out = gfun(xb, flat); float(jnp.sum(out[:2].astype(jnp.float32)))
    ms = slope(gfun, xb, flat)
    log(f"XLA take baseline: {ms:.2f} ms for {E} rows -> "
        f"{E/(ms*1e-3)/1e6:.0f} M rows/s")

    if SMOKE:
        probe_dma(xb, idx_flat, c=64, n_chunks=8)
        probe_same_shape(xb, rng, 128)
        probe_lane(rng)
        probe_windowed(xb, rng, c=128)
        return
    probe_dma(xb, idx_flat, c=128, n_chunks=64)
    probe_dma(xb, idx_flat, c=512, n_chunks=64)
    for c in (128, 1024, 2048):
        probe_same_shape(xb, rng, c)
    probe_lane(rng)
    probe_windowed(xb, rng, c=1024)


if __name__ == "__main__":
    main()
