"""On-chip v1 vs v2 min/max rspmm forward (eval shape), chained with a
carry data-dependency (CLAUDE.md timing trap)."""

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
ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm_pallas import attach_plans, rspmm_pallas_minmax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    e_pad = pad_bucket(e, 8192)
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                       pad_to=e_pad)
    graph = attach_plans(graph, rb=384, chunk=128, host_edges=(
        np.pad(ei, ((0, 0), (0, e_pad - e))),
        np.pad(et, (0, e_pad - e)),
        np.pad(np.ones(e, np.float32), (0, e_pad - e)),
    ))
    x0 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, B, D)).astype(np.float32))

    for name, g in [
        ("v2", graph),
        ("v1", graph.replace(plans=graph.plans.replace(v2=None, v2src=None))),
    ]:
        def step(x, g=g):
            out = rspmm_pallas_minmax(
                g.plans, rel, x, g.edge_weight, "mul", "max", V
            )
            out = jnp.where(jnp.isfinite(out), out, 0.0)
            return 0.999 * x + 0.001 * out

        o = step(x0)
        if name == "v2":
            ref = None
        f1 = jax.jit(lambda x: jax.lax.fori_loop(0, 1, lambda i, c: step(c), x))
        fn = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, c: step(c), x))
        float(jnp.sum(f1(x0))); float(jnp.sum(fn(x0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(jnp.sum(f1(x0))); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(jnp.sum(fn(x0))); tn = time.perf_counter() - t0
            best = min(best, (tn - t1) / (ITERS - 1) * 1e3)
        log(f"{name} max-agg fwd: {best:.2f} ms ({e/(best*1e-3)/1e6:.0f} M e/s)")


if __name__ == "__main__":
    main()
