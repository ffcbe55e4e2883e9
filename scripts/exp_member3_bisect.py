"""Bisect the member-3 TPU kernel fault (exp_member_crash.py): which
component faults — entity conv vs relation conv, forward vs grad, v1 vs v2
plans, Pallas vs XLA backend.

  python scripts/exp_member3_bisect.py <stage>

stages: relfwd fullfwd grad grad_v1 grad_noplans
Run each in its own process (a fault kills the worker)."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPEC = dict(num_nodes=5000, num_base_rel=12, num_comp_rel=6,
            num_base_triples=45000, seed=3, categories=12)


def main(stage: str):
    from ultra_tpu import tasks
    from ultra_tpu.data import kg
    from ultra_tpu.models.nbfnet import (
        UltraConfig, rel_nbfnet_apply, ultra_apply,
    )
    from ultra_tpu.train.loop import (
        init_train_state, init_ultra_params, make_optimizer, make_train_step,
    )
    from ultra_tpu.train.runner import prepare_graph, triples_of

    ds = kg.build_dataset(
        "SyntheticRuleKG",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "kg-datasets"),
        **SPEC,
    ).load()
    t = ds.train
    with_plans = None if stage != "grad_noplans" else False
    graph = prepare_graph(t, with_plans, v2_sort_slots=True)
    if stage == "grad_v1":
        # clear EVERY non-v1 generation (v2rg/w3 may exist if the probe env
        # vars are set) so the dispatch really routes v1
        drop = dict(v2=None, v2src=None, v2rg=None, v2rgsrc=None,
                    w3=None, w3src=None)
        graph = graph.replace(
            plans=graph.plans.replace(**drop),
            relation_graph=graph.relation_graph.replace(
                plans=graph.relation_graph.plans.replace(**drop)
            ),
        )
    cfg = UltraConfig()
    params = init_ultra_params(cfg, jax.random.key(0))
    print(f"stage {stage}: V={t.num_nodes} R={t.num_relations} "
          f"e_pad={graph.num_edges_padded} "
          f"rel graph V={graph.relation_graph.num_nodes} "
          f"rel e_pad={graph.relation_graph.num_edges_padded}", flush=True)

    rng = np.random.default_rng(0)
    trips = triples_of(t)
    rows = trips[rng.choice(len(trips), size=32, replace=False)]
    index = tasks.GraphIndex.build(t.edge_index, t.edge_type, t.num_nodes,
                                   t.num_relations)
    batch = tasks.negative_sampling(index, rows, num_negative=128, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch, ew = jnp.asarray(batch), jnp.asarray(ew)

    if stage == "relfwd":
        r_index = jnp.asarray(batch[:, 0, 2])
        out = rel_nbfnet_apply(
            params["relation_model"], cfg.relation_model,
            graph.relation_graph, r_index,
        )
        print("relfwd ok", float(jnp.sum(out)), flush=True)
    elif stage == "fullfwd":
        out = ultra_apply(params, cfg, graph, batch[:, :8, :])
        print(f"{stage} ok", float(jnp.sum(out)), flush=True)
    else:
        opt = make_optimizer()
        step = make_train_step(cfg, opt, num_negative=128)
        state = init_train_state(params, opt)
        state, loss = step(state, graph, batch, ew)
        print(f"{stage} step ok loss {float(loss):.6f}", flush=True)
    print(f"stage {stage}: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
