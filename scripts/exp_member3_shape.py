"""Member-3 fault, round 2: the grad step crashes the TPU worker on v1, v2
AND the plan-less XLA backend (exp_member3_bisect.py) — so the fault is
shape-triggered in compiled XLA code, not in our kernels. Probe the axes:

  pad+8192   same graph, e_pad bumped one 8192 bucket (272384 -> 280576)
  rand       random synthetic graph with the same V/E/R (data independence)
  nobatch    same graph, batch 16x65 instead of 32x129
  noln       layer_norm off (isolate the LN grad)
  ga2        grad_accum=2 (micro-batch 16x129) — the candidate mitigation
  neg64      batch 32x65 (is it the 32 or the 129?)
  randV:<V>:<bs>  random graph, E=31.4*V edges (member-3 density), given bs
                  — maps the fault region over (V, batch)

  python scripts/exp_member3_shape.py <variant>
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPEC = dict(num_nodes=5000, num_base_rel=12, num_comp_rel=6,
            num_base_triples=45000, seed=3, categories=12)


def main(variant: str):
    from ultra_tpu import tasks
    from ultra_tpu.data import kg
    from ultra_tpu.graph import pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.train.loop import (
        init_train_state, init_ultra_params, make_optimizer, make_train_step,
    )
    from ultra_tpu.train.runner import prepare_graph, triples_of

    if variant.startswith("randV"):
        parts = variant.split(":")
        if len(parts) != 3:
            raise SystemExit("usage: exp_member3_shape.py randV:<V>:<bs>")
        _, vv, vbs = parts
        variant = f"randV{vv}b{vbs}"
    if variant == "rand" or variant.startswith("randV"):
        from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
        from ultra_tpu.ops.rspmm_pallas import attach_plans
        from ultra_tpu.tasks import build_relation_graph_arrays

        if variant.startswith("randV"):
            V = int(vv)
            R_D, E_D = 18, int(V * 136010 / 4326) // 2 * 2
        else:
            V, R_D, E_D = 4326, 18, 136010
        trip = random_kg_triples(V, R_D, E_D, seed=7)
        ei, et = with_inverses(trip, R_D)
        e = ei.shape[1]
        e_pad = 272384 if variant == "rand" else pad_bucket(e, 2048)
        rel_ei, rel_et = build_relation_graph_arrays(ei, et, V, 2 * R_D)
        rel_pad = pad_bucket(rel_ei.shape[1], 1024)
        from ultra_tpu.graph import make_graph as mg
        rel_g = mg(rel_ei, rel_et, num_nodes=2 * R_D, num_relations=4,
                   pad_to=rel_pad)
        rel_g = attach_plans(rel_g, rb=128, chunk=128, host_edges=(
            np.pad(rel_ei, ((0, 0), (0, rel_pad - rel_ei.shape[1]))),
            np.pad(rel_et, (0, rel_pad - rel_et.shape[0])),
            np.pad(np.ones(rel_et.shape[0], np.float32),
                   (0, rel_pad - rel_et.shape[0]))))
        graph = mg(ei, et, num_nodes=V, num_relations=2 * R_D, pad_to=e_pad,
                   relation_graph=rel_g)
        graph = attach_plans(graph, host_edges=(
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e))))
        num_nodes, num_rel = V, 2 * R_D
        index = tasks.GraphIndex.build(ei, et, V, 2 * R_D)
        nd = e // 2
        trips = np.stack([ei[0, :nd], ei[1, :nd], et[:nd]], axis=1)
    else:
        ds = kg.build_dataset(
            "SyntheticRuleKG",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "kg-datasets"),
            **SPEC,
        ).load()
        t = ds.train
        if variant == "pad+8192":
            graph = kg.split_to_graph(
                t,
                pad_edges_to=pad_bucket(t.edge_index.shape[1] + 8192, 8192),
                pad_rel_edges_bucket=1024, with_plans=True,
                v2_sort_slots=True,
            )
        else:
            graph = prepare_graph(t, None, v2_sort_slots=True)
        num_nodes, num_rel = t.num_nodes, t.num_relations
        index = tasks.GraphIndex.build(t.edge_index, t.edge_type, num_nodes,
                                       num_rel)
        trips = triples_of(t)

    cfg = UltraConfig()
    if variant == "noln":
        cfg = cfg.replace(
            relation_model=cfg.relation_model.replace(layer_norm=False),
            entity_model=cfg.entity_model.replace(layer_norm=False),
        )
    params = init_ultra_params(cfg, jax.random.key(0))
    bs, neg = (16, 64) if variant == "nobatch" else (32, 64) if variant == "neg64" else (32, 128)
    if variant.startswith("randV"):
        bs = int(vbs)
    rng = np.random.default_rng(0)
    rows = trips[rng.choice(len(trips), size=bs, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=neg, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    print(f"{variant}: V={num_nodes} R={num_rel} "
          f"e_pad={graph.num_edges_padded} batch={batch.shape}", flush=True)
    opt = make_optimizer()
    ga = 2 if variant == "ga2" else 1
    step = make_train_step(cfg, opt, num_negative=neg, grad_accum=ga)
    state = init_train_state(params, opt)
    state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
    print(f"{variant}: step ok loss {float(loss):.6f}", flush=True)
    print(f"{variant}: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
