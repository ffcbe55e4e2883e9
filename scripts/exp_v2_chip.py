"""On-chip v1 vs fused-v2 rspmm-sum on uniform and realistic synthetic graphs.

Methodology (tunnel-proof): slope timing — time a jitted fori_loop chain at
n=1 and n=N in the same process, slope=(tN-t1)/(N-1); interleave the
configs A/B/A/B over ROUNDS rounds and report per-round slopes + median.
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
ITERS = 24
ROUNDS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chain(step, n):
    return jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))


def slope_ms(f1, fn, x0, n):
    float(jnp.sum(f1(x0)))
    t0 = time.perf_counter(); float(jnp.sum(f1(x0))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(fn(x0))); tn = time.perf_counter() - t0
    return (tn - t1) / (n - 1) * 1e3


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm_pallas import attach_plans, rspmm_pallas_sum
    from ultra_tpu.ops.rspmm_pallas_v2 import build_plan_v2, rspmm_v2_fwd

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, B, D)).astype(np.float32))

    for name, kw in [
        ("uniform", {}),
        ("realistic", dict(rel_dist="zipf", categories=30)),
    ]:
        trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, **kw)
        ei, et = with_inverses(trip, R_DIRECT)
        e_live = ei.shape[1]
        e_pad = pad_bucket(e_live, 8192)
        pad = e_pad - e_live
        ei_p = np.concatenate([ei, np.zeros((2, pad), np.int64)], axis=1)
        et_p = np.concatenate([et, np.zeros(pad, np.int64)])
        ew_p = np.concatenate(
            [np.ones(e_live, np.float32), np.zeros(pad, np.float32)]
        )
        graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                           pad_to=e_pad)
        t0 = time.perf_counter()
        graph = attach_plans(graph, rb=384, chunk=128,
                             host_edges=(ei_p, et_p, ew_p))
        p2c = graph.plans.v2
        p2g = build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=128,
                            edge_ids=np.arange(e_live), dead_slot=e_pad,
                            cluster=False)
        log(f"[{name}] E={e_live} plans {time.perf_counter()-t0:.1f}s | "
            f"v1 chunks {graph.plans.dst.num_chunks} "
            f"(waste {graph.plans.dst.num_chunks*128/e_live:.2f}) | "
            f"v2c e_pad {p2c.e_pad} (waste {p2c.e_pad/e_live:.2f}) tw {p2c.tw} "
            f"groups {p2c.n_groups} | v2g tw {p2g.tw}")

        gv1 = graph.replace(plans=graph.plans.replace(v2=None))

        def step_v1(x, g=gv1):
            out = rspmm_pallas_sum("mul", V, None, g.plans, rel, x, g.edge_weight)
            return 0.999 * x + 0.001 * out

        def mk_v2(p2):
            def step(x, p2=p2, g=graph):
                w_ext = jnp.concatenate(
                    [g.edge_weight, jnp.zeros((1,), g.edge_weight.dtype)])
                out = rspmm_v2_fwd(
                    p2, rel.reshape(rel.shape[0], -1), x.reshape(V, -1), w_ext,
                    mul="mul", out_rows=V).reshape(V, B, D)
                return 0.999 * x + 0.001 * out
            return step

        configs = [("v1", step_v1), ("v2-clu", mk_v2(p2c)), ("v2-glo", mk_v2(p2g))]

        # parity (default precision, bf16 pass): compare v1 vs v2 outputs
        o1 = step_v1(x0)
        for cname, st in configs[1:]:
            o2 = st(x0)
            err = float(jnp.max(jnp.abs(o1 - o2) / (jnp.abs(o1) + 1e-3)))
            log(f"[{name}] {cname} vs v1 max relerr: {err:.2e}")

        chains = {cname: (make_chain(st, 1), make_chain(st, ITERS))
                  for cname, st in configs}
        results = {cname: [] for cname, _ in configs}
        for r in range(ROUNDS):
            for cname, _ in configs:
                f1, fn = chains[cname]
                ms = slope_ms(f1, fn, x0, ITERS)
                results[cname].append(ms)
        for cname, _ in configs:
            msl = sorted(results[cname])
            med = msl[len(msl) // 2]
            log(f"[{name}] {cname}: rounds {['%.2f' % m for m in results[cname]]} "
                f"median {med:.2f} ms ({e_live/(med*1e-3)/1e6:.0f} M e/s)")


if __name__ == "__main__":
    main()
