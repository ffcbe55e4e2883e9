"""On-chip fine-tune train step (bs 8, 32 negs, FB15k-237 shape): v1 grads
vs v2 fwd+d_x grads, same process, slope timing."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
BS, NEG = int(os.environ.get("BS", 8)), int(os.environ.get("NEG", 32))
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.loop import (
        init_train_state, make_optimizer, make_train_step,
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
    if os.environ.get("REMAT"):
        cfg = cfg.replace(
            relation_model=cfg.relation_model.replace(remat=True),
            entity_model=cfg.entity_model.replace(remat=True),
        )
    opt = make_optimizer()
    rng = np.random.default_rng(0)
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
    n_direct = e // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rows = triples[rng.choice(n_direct, size=BS, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=NEG, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch, ew = jnp.asarray(batch), jnp.asarray(ew)

    variants = {
        "v2": graph,
        "v1": graph.replace(plans=graph.plans.replace(v2=None, v2src=None)),
    }
    for name, g in variants.items():
        step = make_train_step(cfg, opt, num_negative=NEG)
        state = init_train_state(params, opt)
        state, loss = step(state, g, batch, ew)  # compile
        float(loss)
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            state, loss = step(state, g, batch, ew)
            float(loss)
            times.append((time.perf_counter() - t0) * 1e3)
        med = sorted(times)[len(times) // 2]
        log(f"{name}: median {med:.0f} ms/step (best {min(times):.0f}) "
            f"loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
