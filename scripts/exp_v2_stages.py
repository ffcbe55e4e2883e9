"""Stage decomposition of the fused-v2 rspmm on chip + chunk-size sweep.

Stages: (a) XLA gather x_e, (b) pallas kernel on pre-gathered x_e,
(c) full path. Chunk sizes 128/256/512/1024 on the realistic graph.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
B, D = 8, 64
F = B * D
ITERS = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(step, x0, n=ITERS, rounds=2, extra=()):
    """step(carry, *extra) -> carry; big operands go through `extra` so they
    are jit ARGUMENTS, not embedded constants (the tunneled compile server
    rejects giant inlined literals)."""
    f1 = jax.jit(lambda x, *a: jax.lax.fori_loop(
        0, 1, lambda i, c: step(c, *a), x))
    fn = jax.jit(lambda x, *a: jax.lax.fori_loop(
        0, n, lambda i, c: step(c, *a), x))
    best = []
    jax.block_until_ready(f1(x0, *extra))
    jax.block_until_ready(fn(x0, *extra))  # compile
    for _ in range(rounds):
        t0 = time.perf_counter(); jax.block_until_ready(f1(x0, *extra))
        t0b = time.perf_counter(); jax.block_until_ready(fn(x0, *extra))
        tend = time.perf_counter()
        best.append(((tend - t0b) - (t0b - t0)) / (n - 1) * 1e3)
    return min(best)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod
    from ultra_tpu.ops.rspmm_pallas import _pad8
    from ultra_tpu.ops.rspmm_pallas_v2 import ALIGN, FOLD, build_plan_v2, rspmm_v2_fwd

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))
    w_ext = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

    for c in (128, 256, 512, 1024):
        p = build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=c,
                          edge_ids=np.arange(e), dead_slot=e)
        gsz = ALIGN // c
        log(f"c={c}: e_pad {p.e_pad} (waste {p.e_pad/e:.3f}) K {p.num_chunks} "
            f"tw {p.tw} groups {p.n_groups}")

        # (a) gather alone
        ms_g = slope(lambda xx: 0.999 * xx + 0.001 * jnp.take(
            xx.astype(jnp.bfloat16), p.src_p, axis=0)[:V].astype(jnp.float32), x)
        # (c) full path
        ms_f = slope(lambda xx: 0.999 * xx + 0.001 * rspmm_v2_fwd(
            p, rel, xx, w_ext, mul="mul", out_rows=V), x)

        # (b) kernel alone on a fixed pre-gathered x_e; the carry is a
        # scalar threaded through the weights so chaining stays sequential
        # without re-writing the 625MB edge stream each iteration.
        x_e0 = jnp.take(x.astype(jnp.bfloat16), p.src_p, axis=0)
        tabs = jnp.take(
            jnp.pad(rel, ((0, 480 - rel.shape[0]), (0, 0))).astype(jnp.bfloat16),
            p.table_ids, axis=0)
        w_kc0 = jnp.take(w_ext, p.perm, axis=0).reshape(
            p.num_chunks, c)
        tl = _pad8(p.type_local)
        k2l = _pad8(p.k2_local)

        def kernel_only(s, x_e0, tabs, w_kc0):
            w_kc = _pad8(w_kc0 * (1.0 + s[0] * 1e-12))
            out_c = pl.pallas_call(
                functools.partial(
                    v2mod._fused_kernel, "mul", c, gsz, p.tw, p.rb2, None),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(1, p.num_chunks),
                    in_specs=[
                        pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),
                        pl.BlockSpec((8, c), lambda j, k, g, b: (k // 8, 0)),
                        pl.BlockSpec((8, ALIGN // FOLD),
                                     lambda j, k, g, b: (k // (8 * gsz), 0)),
                        pl.BlockSpec((c, F), lambda j, k, g, b: (k, j)),
                        pl.BlockSpec((p.tw, F), lambda j, k, g, b: (g[k], j)),
                    ],
                    out_specs=pl.BlockSpec(
                        (p.rb2, F), lambda j, k, g, b: (b[k // gsz], j)),
                    scratch_shapes=[pltpu.VMEM((ALIGN // FOLD, F), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((p.n_compact_pad, F), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(p.group_id, p.k2_blk, tl, w_kc, k2l, x_e0, tabs)
            return s * 0.999 + 1e-9 * out_c[0, :1]

        ms_k = slope(kernel_only, jnp.zeros(1, jnp.float32),
                     extra=(x_e0, tabs, w_kc0))
        log(f"c={c}: gather {ms_g:.2f} ms | kernel {ms_k:.2f} ms | "
            f"full {ms_f:.2f} ms ({e/(ms_f*1e-3)/1e6:.0f} M e/s)")


if __name__ == "__main__":
    main()
