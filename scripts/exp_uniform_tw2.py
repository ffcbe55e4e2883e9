"""Uniform table-width probe, part 2: is the tw=352 cliff real, and do
the GRADIENT kernels (d_x via the src-swapped plan, d_rel whose output is
the table itself) win or lose at the narrow width?

Usage: python scripts/exp_uniform_tw2.py [tw ...]   (default 344 352 360 480)
tw=480 means the global-table fallback (cluster=False).
"""

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


def slope(step, x0, n=ITERS, rounds=3):
    f1 = jax.jit(lambda x: jax.lax.fori_loop(0, 1, lambda i, c: step(c), x))
    fn = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))
    best = []
    jax.block_until_ready(f1(x0)); jax.block_until_ready(fn(x0))
    for _ in range(rounds):
        t0 = time.perf_counter(); jax.block_until_ready(f1(x0))
        t0b = time.perf_counter(); jax.block_until_ready(fn(x0))
        tend = time.perf_counter()
        best.append(((tend - t0b) - (t0b - t0)) / (n - 1) * 1e3)
    return min(best)


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))

    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)  # uniform
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    we = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

    widths = tuple(int(w) for w in sys.argv[1:]) or (344, 352, 360, 480)
    ref = {}
    for tw in widths:
        kw = dict(chunk=1024, edge_ids=np.arange(e), dead_slot=e)
        if tw >= 480:
            kw["cluster"] = False
        else:
            kw["tw"] = tw
        p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, **kw)
        ps = v2mod.build_plan_v2(ei[::-1], et, V, 2 * R_DIRECT, **kw)
        fms = slope(lambda xx, p=p: 0.999 * xx + 0.001 * v2mod.rspmm_v2_fwd(
            p, rel, xx, we, mul="mul", out_rows=V), x)
        dxms = slope(lambda gg, ps=ps: 0.999 * gg + 0.001 * v2mod.rspmm_v2_fwd(
            ps, rel, gg, we, mul="mul", out_rows=V), g)
        drms = slope(lambda xx, p=p: 0.999 * xx + 1e-30 * jnp.sum(
            v2mod.rspmm_v2_drel(p, xx, g, we, rel.shape[0])), x)
        # correctness spot check vs the first width
        out = np.asarray(v2mod.rspmm_v2_fwd(p, rel, x, we, mul="mul",
                                            out_rows=V))
        dr = np.asarray(v2mod.rspmm_v2_drel(p, x, g, we, rel.shape[0]))
        if not ref:
            ref["out"], ref["dr"] = out, dr
            ok = "ref"
        else:
            ok = ("ok" if np.allclose(out, ref["out"], rtol=2e-4, atol=2e-4)
                  and np.allclose(dr, ref["dr"], rtol=2e-4, atol=2e-4)
                  else "MISMATCH")
        log(f"[uniform] tw={p.tw} groups={p.n_groups}: fwd {fms:.2f} ms "
            f"({e/(fms*1e-3)/1e6:.0f} M e/s) | d_x {dxms:.2f} ms | "
            f"d_rel {drms:.2f} ms | parity {ok}")


if __name__ == "__main__":
    main()
