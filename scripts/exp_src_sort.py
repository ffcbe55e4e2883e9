"""src_sort probe: does a source-locality tiebreak in the v2 edge/slot
order speed up the XLA row gather (HBM locality) at bench shape?

Measures the v2 forward slope with src_sort off/on for realistic and
uniform graphs, same process so chip-session variance cancels.
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

    for name, kw in [("realistic", dict(rel_dist="zipf", categories=30)),
                     ("uniform", {})]:
        trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, **kw)
        ei, et = with_inverses(trip, R_DIRECT)
        e = ei.shape[1]
        we = jnp.concatenate([jnp.ones(e, jnp.float32),
                              jnp.zeros(1, jnp.float32)])
        base = None
        for src_sort in (False, True):
            p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=1024,
                                    edge_ids=np.arange(e), dead_slot=e,
                                    src_sort=src_sort)
            # monotonicity of the gather index stream (run-length of
            # non-decreasing src ids): higher = more DRAM locality
            srcs = np.asarray(p.src_p)
            mono = float(np.mean(np.diff(srcs) >= 0))
            ms = slope(lambda xx, p=p: 0.999 * xx + 0.001 * v2mod.rspmm_v2_fwd(
                p, rel, xx, we, mul="mul", out_rows=V), x)
            tag = "src_sort" if src_sort else "default "
            extra = "" if base is None else f" | vs default {base/ms:.3f}x"
            log(f"[{name}] {tag}: {ms:.2f} ms ({e/(ms*1e-3)/1e6:.0f} M e/s) "
                f"mono {mono:.3f}{extra}")
            if base is None:
                base = ms


if __name__ == "__main__":
    main()
