"""FOLD=4 vs FOLD=8 for the v2 rspmm: less per-dst pad (waste 1.13 -> ~1.06)
at 2x flush width. Same-process interleaved slope timing + parity check."""

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
ITERS = 16
ROUNDS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
        we = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

        plans = {}
        for fold in (8, 4):
            v2mod.FOLD = fold
            p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=1024,
                                    edge_ids=np.arange(e), dead_slot=e)
            plans[fold] = p
            log(f"[{name}] fold={fold}: e_pad {p.e_pad} (waste {p.e_pad/e:.3f}) "
                f"tw {p.tw} groups {p.n_groups}")

        outs = {}
        chains = {}
        for fold, p in plans.items():
            v2mod.FOLD = fold

            def step(xx, p=p, fold=fold):
                v2mod.FOLD = fold  # trace-time constant
                out = v2mod.rspmm_v2_fwd(p, rel, xx, we, mul="mul", out_rows=V)
                return 0.999 * xx + 0.001 * out

            outs[fold] = step(x)
            f1 = jax.jit(lambda xx, s=step: jax.lax.fori_loop(0, 1, lambda i, c: s(c), xx))
            fn = jax.jit(lambda xx, s=step: jax.lax.fori_loop(0, ITERS, lambda i, c: s(c), xx))
            float(jnp.sum(f1(x))), float(jnp.sum(fn(x)))
            chains[fold] = (f1, fn)

        err = float(jnp.max(jnp.abs(outs[4] - outs[8]) / (jnp.abs(outs[8]) + 1e-3)))
        log(f"[{name}] fold4 vs fold8 max relerr: {err:.2e}")

        res = {f: [] for f in plans}
        for _ in range(ROUNDS):
            for fold, (f1, fn) in chains.items():
                t0 = time.perf_counter(); float(jnp.sum(f1(x))); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(jnp.sum(fn(x))); tn = time.perf_counter() - t0
                res[fold].append((tn - t1) / (ITERS - 1) * 1e3)
        for fold, ms in res.items():
            med = sorted(ms)[len(ms) // 2]
            log(f"[{name}] fold={fold}: rounds {['%.2f' % m for m in ms]} "
                f"median {med:.2f} ms ({e/(med*1e-3)/1e6:.0f} M e/s)")
    v2mod.FOLD = 8


if __name__ == "__main__":
    main()
