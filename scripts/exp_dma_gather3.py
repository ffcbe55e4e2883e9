"""Round-3 gather probes, take 2 — fixes + narrows the first battery.

exp_dma_gather.py results on the real chip (output/r3_chip/dma_gather.*):
  A  per-row DMA        FAILED probe-side: (1, c) SMEM BlockSpec violates the
                        (8, 128) block-divisibility rule. NOT a design failure.
  B  same-shape axis0   FAILED chip-side: Mosaic remote compile HTTP 500
     take_along_axis    (tpu_compile_helper subprocess exit 1) at C=128/1024/
                        2048 — the op LOWERS offline but the Mosaic->chip
                        compile crashes. This is the mechanism w3 + v2rg rely
                        on.
  C  axis1 lane shuffle compiled + ran (so remote compile itself works).
  D  windowed (B inside scalar-prefetch pipeline) — same crash as B.

This battery:
  A2. per-row DMA gather with indices as a SCALAR-PREFETCH operand (the
      idiomatic form — no blocked SMEM spec), issue-all/wait-all per chunk.
      Measures ns/row definitively; ROOFLINE's one-read-per-edge path needs
      the equivalent of >=255 M rows/s to beat the materialized gather.
  A3. same, double-buffered across chunks (issue chunk i+1's copies before
      waiting chunk i's) to hide issue latency behind DMA drain.
  B2. same-shape axis0 take_along_axis retries: f32 (vs bf16), tiny C=8x128
      tile, and C=256 — to tell dtype/size-triggered compiler crash from a
      categorical one. Result decides whether w3/v2rg stay env-gated off.

Usage: python scripts/exp_dma_gather3.py  (results to stderr)
DMA_PROBE_SMOKE=1 runs tiny shapes in interpret mode (CPU shape check).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMOKE = os.environ.get("DMA_PROBE_SMOKE", "") == "1"
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


# --- A2: per-row DMA gather, scalar-prefetch indices --------------------------


def kernel_dma_sp(idx_ref, x_any, o_ref, sems):
    c = o_ref.shape[0]
    pid = pl.program_id(0)
    base = pid * c
    for i in range(c):
        pltpu.make_async_copy(
            x_any.at[pl.ds(idx_ref[base + i], 1), :],
            o_ref.at[pl.ds(i, 1), :],
            sems.at[i],
        ).start()
    for i in range(c):
        pltpu.make_async_copy(
            x_any.at[pl.ds(idx_ref[base + i], 1), :],
            o_ref.at[pl.ds(i, 1), :],
            sems.at[i],
        ).wait()


def probe_dma_sp(xb, idx, c=256, n_chunks=64):
    name = f"A2:row-DMA scalar-prefetch c={c} ({n_chunks} chunks)"
    try:
        k = n_chunks
        idx_flat = jnp.asarray(idx[: k * c].astype(np.int32))
        f = pl.pallas_call(
            kernel_dma_sp,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(k,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((c, F), lambda i, idx: (i, 0)),
                scratch_shapes=[pltpu.SemaphoreType.DMA((c,))],
            ),
            out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        out = fj(idx_flat, xb)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(xb.astype(jnp.float32))[np.asarray(idx_flat[:c])]
        err = np.abs(got - ref).max()
        ms = slope(fj, idx_flat, xb)
        rows = k * c
        log(f"{name}: {ms:.2f} ms for {rows} rows -> "
            f"{rows/(ms*1e-3)/1e6:.1f} M rows/s ({ms*1e6/rows:.0f} ns/row) "
            f"err={err:.1e}")
        return rows / (ms * 1e-3)
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


# --- A3: double-buffered row DMA into VMEM scratch ----------------------------
# Issues chunk i's copies into buf[i%2] BEFORE waiting chunk i-1's, so DMA
# drain overlaps the next chunk's issue burst; output written from scratch.


def kernel_dma_db(idx_ref, x_any, o_ref, buf, sems):
    c, f = o_ref.shape
    pid = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(pid, 2)

    def issue(chunk_id, sslot):
        base = chunk_id * c
        for i in range(c):
            pltpu.make_async_copy(
                x_any.at[pl.ds(idx_ref[base + i], 1), :],
                buf.at[sslot, pl.ds(i, 1), :],
                sems.at[sslot, i],
            ).start()

    @pl.when(pid == 0)
    def _first():
        issue(0, 0)

    # wait on THIS chunk's copies, then prefetch the next chunk's rows
    base = pid * c
    for i in range(c):
        pltpu.make_async_copy(
            x_any.at[pl.ds(idx_ref[base + i], 1), :],
            buf.at[slot, pl.ds(i, 1), :],
            sems.at[slot, i],
        ).wait()

    @pl.when(pid + 1 < n)
    def _pref():
        issue(pid + 1, 1 - slot)

    o_ref[:] = buf[slot]


def probe_dma_db(xb, idx, c=256, n_chunks=64):
    name = f"A3:row-DMA double-buffered c={c} ({n_chunks} chunks)"
    try:
        k = n_chunks
        idx_flat = jnp.asarray(idx[: k * c].astype(np.int32))
        f = pl.pallas_call(
            kernel_dma_db,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(k,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((c, F), lambda i, idx: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, c, F), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2, c)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        out = fj(idx_flat, xb)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(xb.astype(jnp.float32))[np.asarray(idx_flat[:c])]
        err = np.abs(got - ref).max()
        ms = slope(fj, idx_flat, xb)
        rows = k * c
        log(f"{name}: {ms:.2f} ms for {rows} rows -> "
            f"{rows/(ms*1e-3)/1e6:.1f} M rows/s ({ms*1e6/rows:.0f} ns/row) "
            f"err={err:.1e}")
        return rows / (ms * 1e-3)
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


# --- B2: same-shape axis0 gather crash triage ---------------------------------


def kernel_same_shape(idx_ref, w_ref, o_ref):
    c = o_ref.shape[0]
    f = o_ref.shape[1]
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    idx2d = jnp.broadcast_to(idx[:, None], (c, f))
    o_ref[:] = jnp.take_along_axis(w_ref[:], idx2d, axis=0)


def probe_same_shape(xb, rng, c, f_cols, dtype, tag):
    name = f"B2:same-shape axis0 C={c} F={f_cols} {tag}"
    try:
        k = 16
        x = np.asarray(xb.astype(jnp.float32))[: max(c, 8), :f_cols]
        xj = jnp.asarray(x).astype(dtype)
        idx = rng.integers(0, c, size=(k, c)).astype(np.int32)
        f = pl.pallas_call(
            kernel_same_shape,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((8, c), lambda i: (i // 8, 0)),
                pl.BlockSpec((c, f_cols), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((c, f_cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((k * c, f_cols), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interp(),
        )
        fj = jax.jit(f)
        idx_j = jnp.asarray(idx)
        out = fj(idx_j, xj)
        got = np.asarray(out[:c].astype(jnp.float32))
        ref = np.asarray(xj[:c].astype(jnp.float32))[idx[0]]
        err = np.abs(got - ref).max()
        log(f"{name}: OK err={err:.1e}")
        return True
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
        return None


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(V_PAD, F)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    idx_flat = rng.integers(0, V, size=(E,)).astype(np.int32)

    if SMOKE:
        probe_dma_sp(xb, idx_flat, c=64, n_chunks=8)
        probe_dma_db(xb, idx_flat, c=64, n_chunks=8)
        probe_same_shape(xb, rng, 64, 128, jnp.float32, "f32")
        return
    probe_dma_sp(xb, idx_flat, c=256, n_chunks=64)
    probe_dma_sp(xb, idx_flat, c=1024, n_chunks=32)
    probe_dma_db(xb, idx_flat, c=256, n_chunks=64)
    probe_dma_db(xb, idx_flat, c=1024, n_chunks=32)
    # crash triage: dtype x size grid, cheapest first
    probe_same_shape(xb, rng, 8, 128, jnp.float32, "f32-tiny")
    probe_same_shape(xb, rng, 8, 128, jnp.bfloat16, "bf16-tiny")
    probe_same_shape(xb, rng, 256, 512, jnp.float32, "f32")
    probe_same_shape(xb, rng, 256, 512, jnp.bfloat16, "bf16")


if __name__ == "__main__":
    main()
