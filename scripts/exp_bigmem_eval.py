"""120K/2M-scale eval forward vs the stream budget (round-5 follow-on to
the FB-scale de-slicing win): at the reference's stated max graph size the
eval stream is ~4.3 GB at F=512, so even the old eval path ran 128-wide
F-slices. Sweeps ULTRA_V2_EVAL-style budgets {1e9, 2.8e9, 9e9} for the
single-direction (F=512) and fused both-direction (F=1024) scorers,
chained slope timing.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 120_000, 1_000_000, 400
B, D = 8, 64
ITERS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig, ultra_score_all
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod
    from ultra_tpu.train.loop import init_ultra_params

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=60)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    rel_ei, rel_et = tasks.build_relation_graph_arrays(ei, et, V, 2 * R_DIRECT)
    rel_e_pad = pad_bucket(rel_ei.shape[1], 1024)
    rel_graph = make_graph(rel_ei, rel_et, num_nodes=2 * R_DIRECT,
                           num_relations=4, pad_to=rel_e_pad)
    rel_graph = attach_plans(
        rel_graph, rb=128, chunk=128,
        host_edges=(
            np.pad(rel_ei, ((0, 0), (0, rel_e_pad - rel_ei.shape[1]))),
            np.pad(rel_et, (0, rel_e_pad - rel_et.shape[0])),
            np.pad(np.ones(rel_et.shape[0], np.float32),
                   (0, rel_e_pad - rel_et.shape[0])),
        ),
    )
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                       pad_to=pad_bucket(e, 8192), relation_graph=rel_graph)
    graph = attach_plans(graph, v2_sort_slots=True)
    log(f"graph+plans: {time.perf_counter() - t0:.0f}s "
        f"(E={e}, e_pad={graph.plans.v2.e_pad})")
    cfg = UltraConfig()
    params = init_ultra_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.integers(0, V, size=B))
    t = jnp.asarray(rng.integers(0, V, size=B))
    r = jnp.asarray(rng.integers(0, R_DIRECT, size=B))

    def one_dir(x):
        out = ultra_score_all(params, cfg, graph, h, r_index=r)
        return x + jnp.sum(out)[None] * 1e-30

    def fused(x):
        hh = jnp.concatenate([h, t])
        rr2 = jnp.concatenate([r, r + R_DIRECT])
        qr = jnp.concatenate([r, r])
        out = ultra_score_all(params, cfg, graph, hh, r_index=rr2,
                              query_r_index=qr)
        return x + jnp.sum(out)[None] * 1e-30

    for name, step, f in (("one-dir F=512", one_dir, 512),
                          ("fused-dirs F=1024", fused, 1024)):
        for budget in (1e9, 2.8e9, 9e9):
            with v2mod.stream_budget(int(budget)):
                fs = v2mod._f_slice_width(graph.plans.v2.e_pad, f)
                c1 = jax.jit(lambda x, s=step: jax.lax.fori_loop(
                    0, 1, lambda i, c: s(c), x))
                cn = jax.jit(lambda x, s=step: jax.lax.fori_loop(
                    0, ITERS, lambda i, c: s(c), x))
                try:
                    x0 = jnp.zeros((1,))
                    jax.block_until_ready(c1(x0))
                    jax.block_until_ready(cn(x0))
                    t0 = time.perf_counter(); jax.block_until_ready(c1(x0))
                    t1 = time.perf_counter(); jax.block_until_ready(cn(x0))
                    t2 = time.perf_counter()
                    ms = ((t2 - t1) - (t1 - t0)) / (ITERS - 1) * 1e3
                    log(f"{name} budget={budget:.1e} (slice {fs}): "
                        f"{ms:.0f} ms/fwd")
                except Exception as exc:  # noqa: BLE001 — OOM possible at 9e9
                    log(f"{name} budget={budget:.1e} (slice {fs}): "
                        f"FAILED {type(exc).__name__}: {str(exc)[:120]}")


if __name__ == "__main__":
    main()
