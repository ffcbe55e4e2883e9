"""Isolate the TPU-worker kernel fault in the 6-member synth mixture
(pretrain_synth6): run TWO train steps on ONE member graph, by index.

  python scripts/exp_member_crash.py <member_idx>

Run each index in its own process — a faulting program kills the TPU
worker, not just the step."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPECS = [
    dict(num_nodes=3000, num_base_rel=24, num_comp_rel=12, num_base_triples=24000, seed=0),
    dict(num_nodes=4000, num_base_rel=18, num_comp_rel=9, num_base_triples=30000, seed=1),
    dict(num_nodes=2200, num_base_rel=30, num_comp_rel=15, num_base_triples=18000, seed=2),
    dict(num_nodes=5000, num_base_rel=12, num_comp_rel=6, num_base_triples=45000, seed=3, categories=12),
    dict(num_nodes=1500, num_base_rel=40, num_comp_rel=20, num_base_triples=14000, seed=4, categories=5),
    dict(num_nodes=2800, num_base_rel=22, num_comp_rel=11, num_base_triples=10000, seed=5, rule_keep=0.6),
]


def main(idx: int):
    from ultra_tpu import tasks
    from ultra_tpu.data import kg
    from ultra_tpu.train.loop import init_train_state, make_optimizer, make_train_step
    from ultra_tpu.train.runner import prepare_graph, triples_of
    from ultra_tpu.train.loop import init_ultra_params
    from ultra_tpu.models.nbfnet import UltraConfig

    ds = kg.build_dataset(
        "SyntheticRuleKG",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "kg-datasets"),
        **SPECS[idx],
    ).load()
    graph = prepare_graph(ds.train, None, v2_sort_slots=True)
    t = ds.train
    print(f"member {idx}: V={t.num_nodes} R={t.num_relations} "
          f"E={t.edge_index.shape[1]} e_pad={graph.num_edges_padded} "
          f"rel_e_pad={graph.relation_graph.num_edges_padded} "
          f"v2 tw={graph.plans.v2.tw if graph.plans and graph.plans.v2 else None}",
          flush=True)

    cfg = UltraConfig()
    params = init_ultra_params(cfg, jax.random.key(0))
    opt = make_optimizer()
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, num_negative=128)
    index = tasks.GraphIndex.build(
        t.edge_index, t.edge_type, t.num_nodes, t.num_relations
    )
    trips = triples_of(t)
    rng = np.random.default_rng(0)
    rows = trips[rng.choice(len(trips), size=32, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=128, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    for s in range(2):
        state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
        print(f"member {idx} step {s} loss {float(loss):.6f}", flush=True)
    print(f"member {idx}: OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
