"""In-process A/B of the wide-batch eval scorer (2B=64 queries, F=4096):
v1 vs sliced-v2 kernels, chained slope timing."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
BS = 32
ITERS = 6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.eval import (
        precompute_relation_representations, score_and_rank_batch_cached,
    )
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}")
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    e_pad = pad_bucket(e, 8192)
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
                       pad_to=e_pad, relation_graph=rel_graph)
    graph = attach_plans(
        graph, rb=384, chunk=128,
        host_edges=(
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e)),
        ),
    )
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    cfg = UltraConfig()
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)

    rng = np.random.default_rng(0)
    n_direct = e // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch = triples[rng.choice(n_direct, size=BS, replace=False)]
    t_mask, h_mask = tasks.strict_negative_mask(index, batch)
    bj = jnp.asarray(batch)
    tm, hm = jnp.asarray(t_mask), jnp.asarray(h_mask)

    rel_all = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_all)

    for name, g in [
        ("v2-sliced", graph),
        ("v1", graph.replace(plans=graph.plans.replace(v2=None, v2src=None))),
    ]:
        def step(c, g=g):
            # carry perturbs an input so XLA cannot hoist the (otherwise
            # loop-invariant) scoring out of the timing loop
            rel_c = rel_all + c.astype(rel_all.dtype) * 1e-30
            t_rank, h_rank = score_and_rank_batch_cached(
                params, cfg, g, rel_c, bj, tm, hm
            )
            return c + jnp.sum(t_rank) + jnp.sum(h_rank)

        c1 = jax.jit(lambda c: jax.lax.fori_loop(0, 1, lambda i, cc: step(cc), c))
        cn = jax.jit(lambda c: jax.lax.fori_loop(0, ITERS, lambda i, cc: step(cc), c))
        z = jnp.zeros((), jnp.float32)
        float(c1(z)); float(cn(z))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(c1(z)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(cn(z)); tn = time.perf_counter() - t0
            best = min(best, (tn - t1) / (ITERS - 1) * 1e3)
        log(f"{name}: {best:.0f} ms / {BS}-triple batch "
            f"({BS / (best * 1e-3):.0f} scored q/s device-side)")


if __name__ == "__main__":
    main()
