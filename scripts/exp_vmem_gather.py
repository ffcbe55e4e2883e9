"""Probe: can Mosaic lower a dynamic row gather from VMEM-resident x inside
a Pallas kernel, and at what rate?

If a (chunk,) index vector can gather (chunk, F) rows from a (V, F) VMEM
buffer at MXU-feeding speed, the v2 kernel can drop its HBM gather+stream
(ROOFLINE.md: that lifts the ceiling from ~225 M to ~1.27 G edges/s at the
FB15k-237 eval shape, where x = 14.9 MB fits in VMEM).

Variants probed per chunk of C=128 rows:
  A. jnp.take(x_ref[:], idx, axis=0)            — general gather
  B. per-row fori_loop of dynamic slices        — issue-rate bound
  C. one-hot matmul against the FULL x          — (C, V) @ (V, F) MXU
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

V, F = 14541, 512
E = 616448  # v2 e_pad at the FB15k-237 shape
C = 128
V_PAD = 14592  # multiple of 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel_take(idx_ref, x_ref, o_ref):
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    o_ref[:] = jnp.take(x_ref[:], idx, axis=0)


def kernel_loop(idx_ref, x_ref, o_ref):
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]

    def body(i, _):
        o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(idx[i], 1), :]
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def kernel_onehot(idx_ref, x_ref, o_ref):
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, V_PAD), 1)
    sel = (rows == idx[:, None]).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(sel, x_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )


def run(kern, name, idx_kc, xb):
    k = idx_kc.shape[0]
    try:
        f = pl.pallas_call(
            kern,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((8, C), lambda i: (i // 8, 0)),
                pl.BlockSpec((V_PAD, F), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, F), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((k * C, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        fj = jax.jit(lambda i_, x_: f(i_, x_))
        out = fj(idx_kc, xb)
        float(jnp.sum(out.astype(jnp.float32)))
        # slope timing: n=1 vs n=N chained
        def chain(n):
            def step(c):
                o = fj(idx_kc, xb)
                return c + jnp.sum(o[0].astype(jnp.float32))
            return jax.jit(
                lambda c: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)
            )
        c1, cn = chain(1), chain(8)
        float(c1(jnp.zeros(()))); float(cn(jnp.zeros(())))
        t0 = time.perf_counter(); float(c1(jnp.zeros(()))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(cn(jnp.zeros(()))); tn = time.perf_counter() - t0
        ms = (tn - t1) / 7 * 1e3
        rate = k * C / (ms * 1e-3) / 1e6
        log(f"{name}: {ms:.2f} ms for {k*C} rows -> {rate:.0f} M rows/s")
        return out
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(V_PAD, F)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    k = E // C
    k -= k % 8
    idx = rng.integers(0, V, size=(k, C)).astype(np.int32)
    idx_kc = jnp.asarray(idx)

    ref = x[idx[0]].astype(np.float32)
    for kern, name in [(kernel_take, "A:take"), (kernel_loop, "B:loop"),
                       (kernel_onehot, "C:onehot-full")]:
        out = run(kern, name, idx_kc, xb)
        if out is not None:
            got = np.asarray(out[:C].astype(jnp.float32))
            err = np.abs(got - ref.astype(np.float32)).max() / (np.abs(ref).max())
            log(f"  parity vs numpy gather: {err:.2e}")

    # XLA baseline for the same total gather
    flat = jnp.asarray(idx.reshape(-1))
    g = jax.jit(lambda x_, i_: jnp.take(x_, i_, axis=0))
    o = g(xb, flat); float(jnp.sum(o.astype(jnp.float32)[:2]))
    t0 = time.perf_counter(); float(jnp.sum(g(xb, flat).astype(jnp.float32)[:2])); t1 = time.perf_counter() - t0
    log(f"XLA take baseline: {t1*1e3:.2f} ms (incl dispatch) for {k*C} rows")


if __name__ == "__main__":
    main()
