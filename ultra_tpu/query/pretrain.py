"""Multi-dataset UltraQuery pretraining mixture.

The reference's query-side JointDataset (datasets_query.py:637-709) is only
partially wired upstream; here the mixture trains end-to-end like the KG
pretraining loop (script/pretrain.py semantics): each step samples one
member dataset with probability proportional to its train-query count, then
draws that step's batch from it. Each member gets its own base graph +
DropoutPlanner (fast traversal-dropout masking); the jitted train step is
shared, with one trace per member graph shape. Validation averages MRR over
members (fast_test subsampling as in pretrain.py:244-254).
"""

from __future__ import annotations

import logging
import math
import time
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.query import ops
from ultra_tpu.query.datasets import QueryDataset
from ultra_tpu.query.executor import (
    DropoutPlanner,
    QueryConfig,
    graphs_for_slots,
    projection_schedule,
    simulate_symbolic,
    simulate_symbolic_grouped,
)
from ultra_tpu.query.trainer import (
    answers_to_mask,
    evaluate_queries,
    make_grouped_query_train_step,
    make_query_train_step,
    prepare_query_graph,
)
from ultra_tpu.train.loop import init_train_state, make_optimizer
from ultra_tpu.utils import ckpt as ckpt_lib

logger = logging.getLogger("ultra_tpu")


class QueryPretrainGraphs:
    """Per-member state: device graphs, dropout planners, train index ranges.

    DropoutPlanner init is ~6.6 s / 0.9 GB host per member at 120K-node /
    2M-edge scale, so planners build lazily on a member's first sampled
    batch (a mixture of N large members would otherwise pay all N costs up
    front, most wasted when few members dominate the sampling probs)."""

    def __init__(self, datasets: Sequence[QueryDataset], v2_sort_slots: bool = False):
        self.datasets = list(datasets)
        self.base_graphs = [
            prepare_query_graph(d.graphs[0], v2_sort_slots=v2_sort_slots)
            for d in self.datasets
        ]
        self.valid_graphs = [
            prepare_query_graph(d.graphs[1], v2_sort_slots=v2_sort_slots)
            for d in self.datasets
        ]
        self.hosts = []
        self._planners: List[Optional[DropoutPlanner]] = [None] * len(self.datasets)
        for d, g in zip(self.datasets, self.base_graphs):
            qg = d.graphs[0]
            host = {
                "edge_index": qg.edge_index,
                "edge_type": qg.edge_type,
                "num_nodes": qg.num_nodes,
                "num_relations": qg.num_relations,
                "e_pad": g.num_edges_padded,
                "inverse_rel_plus_one": qg.inverse_rel_plus_one,
            }
            self.hosts.append(host)
        self.train_ranges = [d.split_ranges()[0] for d in self.datasets]
        counts = np.array(
            [hi - lo for lo, hi in self.train_ranges], dtype=np.float64
        )
        self.probs = counts / counts.sum()  # ∝ train-query count

    def planner(self, gi: int) -> DropoutPlanner:
        if self._planners[gi] is None:
            t0 = time.time()
            self._planners[gi] = DropoutPlanner(self.hosts[gi])
            logger.warning(
                "built DropoutPlanner for member %d (%s) in %.1fs", gi,
                self.datasets[gi].name, time.time() - t0,
            )
        return self._planners[gi]


def pretrain_queries(
    cfg: dict,
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    params,
    graphs: QueryPretrainGraphs,
    workdir: str,
    seed: int = 1024,
):
    train_cfg, task_cfg = cfg["train"], cfg["task"]
    num_epoch = int(train_cfg.get("num_epoch", 1))
    batch_size = int(train_cfg.get("batch_size", 8))
    batch_per_epoch = int(train_cfg.get("batch_per_epoch") or 1000)
    adv_temp = float(task_cfg.get("adversarial_temperature", 0.2))
    fast_test = train_cfg.get("fast_test")
    log_interval = int(train_cfg.get("log_interval", 100))

    optimizer = make_optimizer(lr=float(cfg["optimizer"].get("lr", 5e-4)))
    state = init_train_state(params, optimizer)
    # round-grouped projections (the reference scheduler's grouping) are
    # ~1.5x faster per step AND cap the mixture's jit-variant count at
    # (#round buckets) x (#member graph shapes) — the slot-synchronous step
    # mints one variant per distinct slot-graph structure instead
    grouped = bool(train_cfg.get("grouped_projections", True))
    if grouped:
        step_fn = make_grouped_query_train_step(
            ultra_cfg, qcfg, optimizer, adv_temp,
            grad_accum=int(train_cfg.get("grad_accum", 1)),
        )
    else:
        step_fn = make_query_train_step(ultra_cfg, qcfg, optimizer, adv_temp)

    rng = np.random.default_rng(seed)
    tracker = ckpt_lib.BestModelTracker(workdir)
    epoch_block = math.ceil(num_epoch / 10)

    def validate():
        mrrs = []
        for gi, d in enumerate(graphs.datasets):
            (_, _), (lo, hi), _ = d.split_ranges()
            idx = np.arange(lo, hi)
            if fast_test is not None and fast_test < len(idx):
                idx = np.random.default_rng(1024).choice(
                    idx, size=fast_test, replace=False
                )
            m = evaluate_queries(
                state.params, ultra_cfg, qcfg, graphs.valid_graphs[gi], d, idx,
                batch_size=batch_size, metric_names=("mrr",),
                restrict_nodes=d.graphs[1].restrict_nodes,
            )
            logger.warning("valid[%s]: mrr %.4f", d.name, m["mrr"])
            mrrs.append(m["mrr"])
        return float(np.mean(mrrs))

    epoch = 0
    for block_start in range(0, num_epoch, epoch_block):
        for epoch in range(block_start, min(num_epoch, block_start + epoch_block)):
            t0 = time.time()
            losses = []
            for step in range(batch_per_epoch):
                gi = int(rng.choice(len(graphs.datasets), p=graphs.probs))
                d = graphs.datasets[gi]
                lo, hi = graphs.train_ranges[gi]
                take = lo + rng.choice(hi - lo, size=min(batch_size, hi - lo), replace=False)
                while len(take) < batch_size:  # wrap for tiny members
                    take = np.concatenate([take, take[: batch_size - len(take)]])
                kind, operand = ops.decompose(d.queries[take])
                target = answers_to_mask(
                    [d.easy_answers[i] for i in take],
                    graphs.base_graphs[gi].num_nodes,
                ).astype(np.float32)
                if grouped:
                    round_of, has_proj, arg_slot, n_rounds = (
                        projection_schedule(kind)
                    )
                    plan = simulate_symbolic_grouped(
                        kind, operand, round_of, has_proj, arg_slot, n_rounds,
                        graphs.hosts[gi], qcfg, rng, graphs.planner(gi),
                    )
                    round_graphs = graphs_for_slots(graphs.base_graphs[gi], plan)
                    state, loss = step_fn(
                        state, round_graphs, kind, operand, target
                    )
                else:
                    plan = simulate_symbolic(
                        kind, operand, graphs.hosts[gi], qcfg, rng,
                        training=True, planner=graphs.planner(gi),
                    )
                    slot_graphs = graphs_for_slots(graphs.base_graphs[gi], plan)
                    state, loss = step_fn(
                        state, slot_graphs, jnp.asarray(kind),
                        jnp.asarray(operand), jnp.asarray(target),
                    )
                losses.append(loss)
                if step % log_interval == 0:
                    logger.warning(
                        "epoch %d step %d [%s] loss %.6f", epoch, step, d.name,
                        float(loss),
                    )
            logger.warning(
                "epoch %d: avg bce %.6f (%.1fs)", epoch,
                float(np.mean([float(l) for l in losses])), time.time() - t0,
            )
        mrr = validate()
        logger.warning("avg valid mrr after epoch %d: %.4f", epoch, mrr)
        tracker.update(epoch + 1, mrr, state)

    return tracker.load_best(state.params)
