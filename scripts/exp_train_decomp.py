"""Decompose the fine-tune train step: loss-only fwd vs value_and_grad vs
full step, v1 vs v2 kernels, chained slope timing (no dispatch noise)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
BS, NEG = 8, 32
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(f1, fn, n):
    t0 = time.perf_counter(); jax.block_until_ready(f1()); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(fn()); tn = time.perf_counter() - t0
    return (tn - t1) / (n - 1) * 1e3


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig, ultra_apply
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.loop import self_adversarial_bce
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
    rng = np.random.default_rng(0)
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
    n_direct = e // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rows = triples[rng.choice(n_direct, size=BS, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=NEG, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch = jnp.asarray(batch)

    for name, g in [
        ("v2", graph),
        ("v1", graph.replace(plans=graph.plans.replace(v2=None, v2src=None))),
    ]:
        g = g.replace(edge_weight=jnp.asarray(ew))

        def loss_fn(params, g=g):
            pred = ultra_apply(params, cfg, g, batch)
            return self_adversarial_bce(pred, 1.0, NEG)

        def chain(f, n):
            def body(i, c):
                out = f(jax.tree.map(lambda a: a * (1.0 + 0e-9 * c), params))
                return c + (out if out.ndim == 0 else out[0])

            return jax.jit(lambda: jax.lax.fori_loop(0, n, body, jnp.zeros(())))

        def gfn(p, g=g):
            # consume the grads so XLA cannot prune the backward pass
            val, grads = jax.value_and_grad(loss_fn)(p)
            return val + sum(jnp.sum(l) for l in jax.tree.leaves(grads)) * 1e-9
        for label, f in [("fwd ", loss_fn), ("grad", gfn)]:
            f1, fn = chain(f, 1), chain(f, ITERS)
            jax.block_until_ready(f1()); jax.block_until_ready(fn())
            ms = min(slope(f1, fn, ITERS), slope(f1, fn, ITERS))
            log(f"{name} {label}: {ms:.0f} ms")


if __name__ == "__main__":
    main()
