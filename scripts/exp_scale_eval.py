"""On-chip round-2 scale + e2e eval measurements:

1. 120K-node / 2M-edge graph (the reference's stated max, README:258):
   full 12-layer all-node-score forward, v1 vs v2 (gate now admits the
   ~2.2 GB gather stream at eval width).
2. FB15k-237-shape end-to-end filtered evaluation throughput (scored
   queries/s) through train.eval.collect_rankings — the number README
   quotes (93-113 q/s on v1 in round 1).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, D = 8, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(v, e_direct, r_direct, rb=None):
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm_pallas import attach_plans, auto_rb

    trip = random_kg_triples(v, r_direct, e_direct, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, r_direct)
    e = ei.shape[1]
    e_pad = pad_bucket(e, 8192)
    rel_ei, rel_et = tasks.build_relation_graph_arrays(ei, et, v, 2 * r_direct)
    rel_e_pad = pad_bucket(rel_ei.shape[1], 1024)
    rel_graph = make_graph(rel_ei, rel_et, num_nodes=2 * r_direct,
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
    graph = make_graph(ei, et, num_nodes=v, num_relations=2 * r_direct,
                       pad_to=e_pad, relation_graph=rel_graph)
    t0 = time.perf_counter()
    graph = attach_plans(
        graph, rb=rb, chunk=128,
        host_edges=(
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e)),
        ),
    )
    log(f"built V={v} E={e} plans in {time.perf_counter()-t0:.0f}s "
        f"(v2 e_pad {graph.plans.v2.e_pad}, waste {graph.plans.v2.e_pad/e:.2f}, "
        f"tw {graph.plans.v2.tw} groups {graph.plans.v2.n_groups})")
    return graph, ei, et


def main():
    from ultra_tpu import tasks
    from ultra_tpu.models.nbfnet import UltraConfig, ultra_score_all
    from ultra_tpu.train.eval import collect_rankings
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}")
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    cfg = UltraConfig()

    # --- 1. reference-max-scale forward -----------------------------------
    graph, ei, et = build(120_000, 1_000_000, 400)
    h = jnp.asarray(np.arange(B) * 1000)
    rr = jnp.asarray(np.arange(B) % graph.num_relations)

    for name, g in [
        ("v2", graph),
        ("v1", graph.replace(plans=graph.plans.replace(v2=None, v2src=None))),
    ]:
        def fwd_step(x, g=g):
            out = ultra_score_all(params, cfg, g, h, r_index=rr)
            return x + jnp.sum(out)[None] * 1e-6

        f1 = jax.jit(lambda x: jax.lax.fori_loop(0, 1, lambda i, c: fwd_step(c), x))
        fn = jax.jit(lambda x: jax.lax.fori_loop(0, 3, lambda i, c: fwd_step(c), x))
        z = jnp.zeros((1,))
        float(jnp.sum(f1(z))); float(jnp.sum(fn(z)))
        t0 = time.perf_counter(); float(jnp.sum(f1(z))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(fn(z))); tn = time.perf_counter() - t0
        log(f"[120K/2M] {name} full fwd (B=8 all-node scores): "
            f"{(tn - t1) / 2 * 1e3:.0f} ms")
    del graph

    # --- 2. e2e filtered eval throughput (FB15k-237 shape) ----------------
    graph, ei, et = build(14541, 272115, 237)
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rng = np.random.default_rng(0)
    n_eval = 512
    trips = triples[rng.choice(n_direct, size=n_eval, replace=False)]

    for bs in (16, 32):
        # warm (compile) on a small slice, then time the full pass
        collect_rankings(params, cfg, graph, trips[: 2 * bs], index, batch_size=bs)
        t0 = time.perf_counter()
        collect_rankings(params, cfg, graph, trips, index, batch_size=bs)
        dt = time.perf_counter() - t0
        log(f"[fb-shape] e2e filtered eval bs={bs}: {n_eval/dt:.0f} scored q/s "
            f"({dt:.1f}s for {n_eval})")


if __name__ == "__main__":
    main()
