"""Probe 2: Mosaic gather forms for VMEM row gather.

D. take_along_axis with output-shaped indices (Mosaic's gather contract)
E. two-level: one-hot over 114 row-groups of 128 (MXU) -> within-group
   take_along_axis... only if D works.
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

V, F = 14541, 512
E = 616448
C = 128
V_PAD = 14592


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel_tala(idx_ref, x_ref, o_ref):
    idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
    idx2d = jnp.broadcast_to(idx[:, None], (C, F))
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)


def run(kern, name, idx_kc, xb, k):
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
        fj = jax.jit(f)
        out = fj(idx_kc, xb)
        float(jnp.sum(out[:2].astype(jnp.float32)))
        def chain(n):
            return jax.jit(lambda c: jax.lax.fori_loop(
                0, n, lambda i, cc: cc + jnp.sum(fj(idx_kc, xb)[0].astype(jnp.float32)), c))
        c1, cn = chain(1), chain(8)
        float(c1(jnp.zeros(()))); float(cn(jnp.zeros(())))
        t0 = time.perf_counter(); float(c1(jnp.zeros(()))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(cn(jnp.zeros(()))); tn = time.perf_counter() - t0
        ms = (tn - t1) / 7 * 1e3
        log(f"{name}: {ms:.2f} ms for {k*C} rows -> {k*C/(ms*1e-3)/1e6:.0f} M rows/s")
        return out
    except Exception as exc:  # noqa: BLE001
        log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
        return None


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(V_PAD, F)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    k = (E // C) - (E // C) % 8
    idx = rng.integers(0, V, size=(k, C)).astype(np.int32)
    out = run(kernel_tala, "D:take_along_axis", jnp.asarray(idx), xb, k)
    if out is not None:
        got = np.asarray(out[:C].astype(jnp.float32))
        ref = x[idx[0]]
        log(f"  parity: {np.abs(got - ref).max() / np.abs(ref).max():.2e}")


if __name__ == "__main__":
    main()
