"""Decompose the compose+fold slowdown: which op is slow when fused?"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
F = 512


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


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses

    log(f"devices: {jax.devices()}")
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    src, dst = ei[1], ei[0]
    order = np.argsort(dst, kind="stable")
    src_s, et_s = src[order], et[order]
    e_pad = ((e + 4095) // 4096) * 4096
    src_p = np.zeros(e_pad, np.int64); src_p[:e] = src_s
    et_p = np.zeros(e_pad, np.int64); et_p[:e] = et_s
    n1 = e_pad // 8

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x0 = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32)).astype(dt)
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32)).astype(dt)
    m0 = jnp.asarray(rng.normal(size=(e_pad, F)).astype(np.float32)).astype(dt)
    srcj, etj = jnp.asarray(src_p), jnp.asarray(et_p)
    w = jnp.ones((e_pad, 1), dt)

    def t(name, step, carry):
        ms = chained_ms(step, carry, iters=4)
        log(f"{name}: {ms:.2f} ms ({e/(ms*1e-3)/1e6:.0f} M edges/s)")

    # gather from small rel table only
    t("take(rel, et)", lambda x: x + 1e-6 * jnp.take(rel, etj, axis=0)[:V].astype(dt), x0)
    # two gathers + mul, no fold
    t("take*take*w", lambda x: x + 1e-6 * (
        jnp.take(rel, etj, axis=0) * jnp.take(x, srcj, axis=0) * w)[:V].astype(dt), x0)
    # fold alone on materialized m (reshape-sum)
    t("fold8 reshape", lambda m: m + 1e-6 * jnp.tile(
        m.reshape(n1, 8, F).sum(axis=1).astype(dt), (8, 1)).reshape(m.shape), m0)
    # fold alone via strided slices
    def fold_strided(m):
        p = m[0::8]
        for k in range(1, 8):
            p = p + m[k::8]
        return m + 1e-6 * jnp.tile(p.astype(dt), (8, 1)).reshape(m.shape)
    t("fold8 strided", fold_strided, m0)
    # gather + fold with barrier between (force separate kernels)
    def barrier_ver(x):
        m = jnp.take(rel, etj, axis=0) * jnp.take(x, srcj, axis=0) * w
        m = jax.lax.optimization_barrier(m)
        p1 = m.reshape(n1, 8, F).sum(axis=1)
        return x + 1e-6 * p1[:V].astype(dt)
    t("compose|barrier|fold", barrier_ver, x0)
    # gather + strided fold fused
    def strided_fused(x):
        m = jnp.take(rel, etj, axis=0) * jnp.take(x, srcj, axis=0) * w
        p = m[0::8]
        for k in range(1, 8):
            p = p + m[k::8]
        return x + 1e-6 * p[:V].astype(dt)
    t("compose+fold strided", strided_fused, x0)
    # reshape-3d gather: take into (n1, 8, F) directly then sum
    def takes3d(x):
        m = jnp.take(x, srcj.reshape(n1, 8), axis=0)  # (n1, 8, F)
        r = jnp.take(rel, etj.reshape(n1, 8), axis=0)
        p1 = (m * r).sum(axis=1)
        return x + 1e-6 * p1[:V].astype(dt)
    t("take3d+sum", takes3d, x0)


if __name__ == "__main__":
    main()
