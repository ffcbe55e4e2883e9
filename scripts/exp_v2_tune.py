"""Tuning probes: gather variants, ALIGN/chunk 2048, same-process v1 baseline."""

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
    f1 = jax.jit(lambda x, *a: jax.lax.fori_loop(0, 1, lambda i, c: step(c, *a), x))
    fn = jax.jit(lambda x, *a: jax.lax.fori_loop(0, n, lambda i, c: step(c, *a), x))
    best = []
    jax.block_until_ready(f1(x0, *extra)); jax.block_until_ready(fn(x0, *extra))
    for _ in range(rounds):
        t0 = time.perf_counter(); jax.block_until_ready(f1(x0, *extra))
        t0b = time.perf_counter(); jax.block_until_ready(fn(x0, *extra))
        tend = time.perf_counter()
        best.append(((tend - t0b) - (t0b - t0)) / (n - 1) * 1e3)
    return min(best)


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod
    from ultra_tpu.ops.rspmm_pallas import attach_plans, rspmm_pallas_sum

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))
    w_ext = jnp.concatenate([jnp.ones(544230 + 1, jnp.float32)])

    for name, kw in [("realistic", dict(rel_dist="zipf", categories=30)),
                     ("uniform", {})]:
        trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, **kw)
        ei, et = with_inverses(trip, R_DIRECT)
        e = ei.shape[1]
        we = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

        # v1 baseline (same process)
        e_pad = pad_bucket(e, 8192)
        pad = e_pad - e
        ei_p = np.concatenate([ei, np.zeros((2, pad), np.int64)], axis=1)
        et_p = np.concatenate([et, np.zeros(pad, np.int64)])
        ew_p = np.concatenate([np.ones(e, np.float32), np.zeros(pad, np.float32)])
        graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                           pad_to=e_pad)
        graph = attach_plans(graph, rb=384, chunk=128,
                             host_edges=(ei_p, et_p, ew_p), v2=False)
        x3 = x.reshape(V, B, D)
        rel3 = rel.reshape(-1, B, D)
        ms_v1 = slope(lambda xx, g=graph: 0.999 * xx + 0.001 * rspmm_pallas_sum(
            "mul", V, None, g.plans, rel3, xx, g.edge_weight), x3)
        log(f"[{name}] v1: {ms_v1:.2f} ms ({e/(ms_v1*1e-3)/1e6:.0f} M e/s)")

        for align, c in [(1024, 512), (1024, 1024), (1536, 1536), (2048, 2048)]:
            v2mod.ALIGN = align
            p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=c,
                                    edge_ids=np.arange(e), dead_slot=e)
            # (dropped pure-gather probe: measured in exp_v2_stages)
            ms_f = slope(lambda xx, we=we, p=p: 0.999 * xx + 0.001 *
                         v2mod.rspmm_v2_fwd(p, rel, xx, we, mul="mul",
                                            out_rows=V), x)
            log(f"[{name}] align={align} c={c}: e_pad {p.e_pad} "
                f"(waste {p.e_pad/e:.3f}) tw {p.tw} g {p.n_groups} | "
                f"full {ms_f:.2f} ms "
                f"({e/(ms_f*1e-3)/1e6:.0f} M e/s) | vs v1 {ms_v1/ms_f:.2f}x")
        v2mod.ALIGN = 1024


if __name__ == "__main__":
    main()
