"""Signal probe for the offline transfer experiment (round-5 item #1):
from-scratch pretraining on a mixture of rule-KGs must raise zero-shot
filtered MRR on HELD-OUT rule-KGs (fresh vocab, different V/E/R).

CPU, small scale — establishes that the planted compositional rules carry
enough learnable, vocabulary-independent signal before the full CLI run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tests.conftest  # noqa: F401  CPU config

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu import tasks
from ultra_tpu.data.synthetic import rule_kg_dataset
from ultra_tpu.models.nbfnet import UltraConfig, NBFNetConfig
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.train.loop import (
    init_train_state, init_ultra_params, make_optimizer, make_train_step,
)
from ultra_tpu.train.pretrain import PretrainGraphs
from ultra_tpu.train.runner import prepare_graph, triples_of


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def holdout_eval(params, cfg, ds, limit=150):
    graph = prepare_graph(ds.test, with_plans=False)
    ei = np.concatenate([ds.train.target_edge_index, ds.valid.target_edge_index,
                         ds.test.target_edge_index], axis=1)
    et = np.concatenate([ds.train.target_edge_type, ds.valid.target_edge_type,
                         ds.test.target_edge_type])
    filt = tasks.GraphIndex.build(ei, et, ds.test.num_nodes, ds.test.num_relations)
    return eval_lib.evaluate(
        params, cfg, graph, triples_of(ds.test), filt, batch_size=8,
        metrics=("mrr", "hits@10"), limit=limit, rng=np.random.default_rng(0),
    )


def main():
    dim = int(os.environ.get("DIM", "32"))
    layers = int(os.environ.get("LAYERS", "4"))
    steps_total = int(os.environ.get("STEPS", "600"))
    eval_every = int(os.environ.get("EVAL_EVERY", "100"))
    bs = 16
    negs = 32

    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=dim, hidden_dims=(dim,) * layers,
                                    num_relation=4),
        entity_model=NBFNetConfig(input_dim=dim, hidden_dims=(dim,) * layers,
                                  num_relation=1, project_relations=True),
    )

    mix_specs = [
        dict(num_nodes=300, num_base_rel=12, num_comp_rel=6, num_base_triples=1400, seed=0),
        dict(num_nodes=400, num_base_rel=10, num_comp_rel=5, num_base_triples=1700, seed=1),
        dict(num_nodes=250, num_base_rel=8, num_comp_rel=4, num_base_triples=1100, seed=2),
    ]
    held_specs = [
        dict(num_nodes=350, num_base_rel=14, num_comp_rel=7, num_base_triples=1600, seed=10),
        dict(num_nodes=280, num_base_rel=9, num_comp_rel=5, num_base_triples=1200, seed=11),
    ]
    mix = [rule_kg_dataset(f"mix{i}", **s) for i, s in enumerate(mix_specs)]
    held = [rule_kg_dataset(f"held{i}", **s) for i, s in enumerate(held_specs)]
    for d in mix + held:
        log(f"{d.name}: V={d.train.num_nodes} R={d.train.num_relations} "
            f"E_msg={d.train.edge_index.shape[1]} "
            f"targets train/valid/test = {d.train.target_edge_type.shape[0]}/"
            f"{d.valid.target_edge_type.shape[0]}/{d.test.target_edge_type.shape[0]}")

    graphs = PretrainGraphs(mix, with_plans=False)
    params = init_ultra_params(cfg, jax.random.key(42))
    optimizer = make_optimizer(lr=5e-4)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer, adversarial_temperature=1.0,
                              num_negative=negs)
    rng = np.random.default_rng(7)

    for h in held:
        m = holdout_eval(state.params, cfg, h)
        log(f"[step 0 / untrained] heldout {h.name}: {m}")

    t0 = time.time()
    for step in range(1, steps_total + 1):
        gi = int(rng.choice(len(mix), p=graphs.graph_probs))
        trips = graphs.train_triples[gi]
        take = rng.choice(len(trips), size=min(bs, len(trips)), replace=False)
        batch = tasks.negative_sampling(
            graphs.train_indexes[gi], trips[take], negs, strict=True, rng=rng)
        ew = tasks.easy_edge_weights(
            graphs.train_indexes[gi], batch,
            graphs.train_graphs[gi].num_edges_padded, remove_one_hop=False)
        state, loss = step_fn(state, graphs.train_graphs[gi],
                              jnp.asarray(batch), jnp.asarray(ew))
        if step % eval_every == 0:
            msg = [f"step {step} (loss {float(loss):.4f}, {time.time()-t0:.0f}s)"]
            for h in held:
                m = holdout_eval(state.params, cfg, h)
                msg.append(f"{h.name}: mrr {m['mrr']:.4f} h10 {m['hits@10']:.4f}")
            log(" | ".join(msg))


if __name__ == "__main__":
    main()
