"""Prototype timing for the v2 rspmm-sum formulation (indices are random —
timing only):

  step 1 (XLA):    x_e = x[src_p]                       (E_pad, F) gather
  step 2 (Pallas): per chunk of 128 dst-sorted edges:
                     relg = onehot(type_local, TW) @ table_block   [TW-wide]
                     m    = x_e_chunk * relg * w
                     p    = m.reshape(16, 8, F).sum(1)  # per-dst fold-8
  step 3 (XLA):    L2 tree: take + reshape-sum at E/8 scale

Compares table widths TW=128 (clustered type tables) vs TW=512 (full
one-hot fallback) and measures each stage separately.
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

V, R = 14541, 474
F = 512
E = 544230
E_PAD = ((int(E * 1.093) + 1023) // 1024) * 1024  # per-dst pad-8 waste
K = E_PAD // 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_ms(step, x0, iters=8):
    def run(n):
        f = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))
        float(jnp.sum(f(x0)))
        t0 = time.perf_counter()
        float(jnp.sum(f(x0)))
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(iters + 1)
    return max(tn - t1, 1e-9) / iters * 1e3


def _onehot(ids, width, dtype):
    c = ids.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, width), 1)
    return (ids[:, None] == iota).astype(dtype)


def v2_kernel(tw, group_ref, tl_ref, w_ref, xe_ref, tab_ref, out_ref):
    k = pl.program_id(0)
    row = jax.lax.rem(k, 8)
    tl = tl_ref[pl.ds(row, 1), :][0]
    w = w_ref[pl.ds(row, 1), :][0]
    sel = _onehot(tl, tw, xe_ref.dtype)
    relg = jnp.dot(sel, tab_ref[:], preferred_element_type=jnp.float32)
    m = xe_ref[:].astype(jnp.float32) * relg * w[:, None].astype(jnp.float32)
    out_ref[:] = m.reshape(16, 8, F).sum(axis=1)


def make_call(tw, n_groups):
    kern = functools.partial(v2_kernel, tw)
    k8 = ((K + 7) // 8) * 8
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # group id per chunk
            grid=(K,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda k, g: (k // 8, 0)),  # type_local
                pl.BlockSpec((8, 128), lambda k, g: (k // 8, 0)),  # w
                pl.BlockSpec((128, F), lambda k, g: (k, 0)),       # x_e chunk
                pl.BlockSpec((tw, F), lambda k, g: (g[k], 0)),     # type table
            ],
            out_specs=pl.BlockSpec((16, F), lambda k, g: (k, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((K * 16, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def main():
    log(f"devices: {jax.devices()}  E_pad={E_PAD} K={K}")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32)).astype(dt)
    src = jnp.asarray(rng.integers(0, V, size=E_PAD))
    tl128 = jnp.asarray(rng.integers(0, 128, size=(K, 128)).astype(np.int32))
    tl512 = jnp.asarray(rng.integers(0, R, size=(K, 128)).astype(np.int32))
    w = jnp.asarray(rng.uniform(size=(K, 128)).astype(np.float32))
    n_groups = max(K // 8, 1)
    groups = jnp.asarray((np.arange(K) // 8 % n_groups).astype(np.int32))
    tabs128 = jnp.asarray(rng.normal(size=(n_groups * 128, F)).astype(np.float32)).astype(dt)
    rel512 = jnp.asarray(rng.normal(size=(512, F)).astype(np.float32)).astype(dt)
    g512 = jnp.zeros(K, jnp.int32)

    def t(name, step, carry, iters=6):
        ms = chained_ms(step, carry, iters=iters)
        log(f"{name}: {ms:.2f} ms ({E/(ms*1e-3)/1e6:.0f} M edges/s)")
        return ms

    # stage 1 alone: gather
    t("gather x_e", lambda c: c * 0.999 + 0.001 * jnp.take(
        jnp.tile(c[:1], (V, 1)) + x, src, axis=0)[:1], x[:1])

    call128 = make_call(128, n_groups)
    call512 = make_call(512, 1)

    xe0 = jnp.take(x, src, axis=0)

    # stage 2 alone (TW=128): kernel on pre-gathered x_e
    def k128(xe):
        out = call128(groups, tl128, w, xe, tabs128)
        return 0.999 * xe + 0.001 * jnp.tile(out[: E_PAD // 8], (8, 1)).astype(dt)

    t("kernel TW=128", k128, xe0)

    def k512(xe):
        out = call512(g512, tl512, w, xe, rel512)
        return 0.999 * xe + 0.001 * jnp.tile(out[: E_PAD // 8], (8, 1)).astype(dt)

    t("kernel TW=512", k512, xe0)

    # fused step: gather + kernel TW=128
    def fused(x_):
        xe = jnp.take(x_, src, axis=0)
        out = call128(groups, tl128, w, xe, tabs128)
        return 0.999 * x_ + 0.001 * out[:V].astype(dt)

    t("gather+kernel TW=128", fused, x)

    # L2 tree at E/8 scale: take + fold-8
    n1 = K * 16
    idx2 = jnp.asarray(rng.integers(0, n1, size=((n1 + 1023) // 1024) * 1024 * 2))
    p1 = jnp.asarray(rng.normal(size=(n1, F)).astype(np.float32))

    def l2(p):
        q = jnp.take(p, idx2, axis=0)
        return 0.999 * p + 0.001 * jnp.tile(
            q.reshape(-1, 8, F).sum(axis=1), (8, 1))[:n1]

    t("L2 take+fold", l2, p1)


if __name__ == "__main__":
    main()
