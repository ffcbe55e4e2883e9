"""Multi-graph pretraining — the TPU rewrite of script/pretrain.py.

The reference's ``multigraph_collator`` samples one member graph per step
with probability proportional to its target-edge count, then draws that
step's batch from it (pretrain.py:26-37). Validation loops over every
member graph and averages MRR, optionally subsampling each valid set
(``fast_test``, pretrain.py:244-254).

Each member graph gets its own jitted step (shapes differ per graph); the
parameter pytree and optimizer state are shared across them.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu import tasks
from ultra_tpu.data import kg
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.train.loop import init_train_state, make_optimizer, make_train_step
from ultra_tpu.train.runner import prepare_graph, triples_of
from ultra_tpu.utils import ckpt as ckpt_lib

logger = logging.getLogger("ultra_tpu")


class PretrainGraphs:
    """Per-member-graph state: device graphs, host indexes, triples."""

    def __init__(self, datasets: Sequence[kg.KGDataset], with_plans: Optional[bool] = None,
                 v2_sort_slots: bool = False):
        self.datasets = list(datasets)
        self.train_graphs = [
            prepare_graph(d.train, with_plans, v2_sort_slots=v2_sort_slots)
            for d in datasets
        ]
        self.valid_graphs = [
            prepare_graph(d.valid, with_plans, v2_sort_slots=v2_sort_slots)
            for d in datasets
        ]
        self.train_indexes = [
            tasks.GraphIndex.build(
                d.train.edge_index, d.train.edge_type, d.train.num_nodes, d.train.num_relations
            )
            for d in datasets
        ]
        # transductive filtering graph per member: all targets
        self.filtered = []
        for d in datasets:
            ei = np.concatenate(
                [d.train.target_edge_index, d.valid.target_edge_index, d.test.target_edge_index],
                axis=1,
            )
            et = np.concatenate(
                [d.train.target_edge_type, d.valid.target_edge_type, d.test.target_edge_type]
            )
            self.filtered.append(
                tasks.GraphIndex.build(ei, et, d.train.num_nodes, d.train.num_relations)
            )
        self.train_triples = [triples_of(d.train) for d in datasets]
        counts = np.array([len(t) for t in self.train_triples], dtype=np.float64)
        self.graph_probs = counts / counts.sum()  # ∝ edge count, pretrain.py:26-37


def pretrain(
    cfg: dict,
    ultra_cfg: UltraConfig,
    params,
    graphs: PretrainGraphs,
    workdir: str,
    seed: int = 1024,
):
    train_cfg, task_cfg = cfg["train"], cfg["task"]
    num_epoch = int(train_cfg.get("num_epoch", 10))
    batch_size = int(train_cfg.get("batch_size", 64))
    batch_per_epoch = int(train_cfg.get("batch_per_epoch", 1000))
    num_negative = int(task_cfg.get("num_negative", 512))
    adv_temp = float(task_cfg.get("adversarial_temperature", 1.0))
    strict = bool(task_cfg.get("strict_negative", True))
    fast_test = train_cfg.get("fast_test")
    log_interval = int(train_cfg.get("log_interval", 100))

    optimizer = make_optimizer(lr=float(cfg["optimizer"].get("lr", 5e-4)))
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(
        ultra_cfg, optimizer, adversarial_temperature=adv_temp,
        num_negative=num_negative,
        grad_accum=int(train_cfg.get("grad_accum", 1)),
    )

    rng = np.random.default_rng(seed)
    tracker = ckpt_lib.BestModelTracker(workdir)
    epoch_block = math.ceil(num_epoch / 10)

    def validate():
        mrrs = []
        for gi, d in enumerate(graphs.datasets):
            m = eval_lib.evaluate(
                state.params,
                ultra_cfg,
                graphs.valid_graphs[gi],
                triples_of(d.valid),
                graphs.filtered[gi],
                batch_size=max(batch_size // 8, 1),
                metrics=("mrr",),
                limit=fast_test,
                rng=np.random.default_rng(seed),
            )
            logger.warning("valid[%s]: %s", d.name, m)
            mrrs.append(m["mrr"])
        return float(np.mean(mrrs))

    epoch = 0
    for block_start in range(0, num_epoch, epoch_block):
        for epoch in range(block_start, min(num_epoch, block_start + epoch_block)):
            t0 = time.time()
            losses = []
            for step in range(batch_per_epoch):
                gi = int(rng.choice(len(graphs.datasets), p=graphs.graph_probs))
                trips = graphs.train_triples[gi]
                take = rng.choice(len(trips), size=min(batch_size, len(trips)), replace=False)
                if len(take) < batch_size:
                    take = np.concatenate(
                        [take, rng.choice(len(trips), size=batch_size - len(take))]
                    )
                batch = tasks.negative_sampling(
                    graphs.train_indexes[gi], trips[take], num_negative, strict=strict, rng=rng
                )
                ew = tasks.easy_edge_weights(
                    graphs.train_indexes[gi],
                    batch,
                    graphs.train_graphs[gi].num_edges_padded,
                    remove_one_hop=ultra_cfg.entity_model.remove_one_hop,
                )
                try:
                    state, loss = step_fn(
                        state, graphs.train_graphs[gi], jnp.asarray(batch), jnp.asarray(ew)
                    )
                except jax.errors.JaxRuntimeError as exc:
                    if "UNAVAILABLE" not in str(exc):
                        raise
                    # a TPU-worker crash ("kernel fault") poisons the whole
                    # client process — turn the bare backend traceback into
                    # an actionable diagnostic. Known instance: the XLA
                    # layer-norm backward faults at specific (V, batch)
                    # tile shapes (evidence/r5/member3_fault.md);
                    # train.grad_accum changes the micro-batch shape and
                    # sidesteps it with full-batch numerics.
                    d = graphs.datasets[gi]
                    g = graphs.train_graphs[gi]
                    raise RuntimeError(
                        f"TPU worker crashed executing the train step on "
                        f"mixture member {gi} ({d.name}: V={g.num_nodes} "
                        f"R={g.num_relations} e_pad={g.num_edges_padded}, "
                        f"batch_size={batch_size}). This is a backend "
                        f"codegen fault at this shape, not a data error — "
                        f"set train.grad_accum: 2 (micro-batches change "
                        f"the faulting shape; numerics stay identical) or "
                        f"change batch_size, then resume from the crash "
                        f"checkpoint. See evidence/r5/member3_fault.md."
                    ) from exc
                losses.append(loss)
                if step % log_interval == 0:
                    logger.warning("epoch %d step %d loss %.6f", epoch, step, float(loss))
            logger.warning(
                "epoch %d: avg bce %.6f (%.1fs)", epoch,
                float(np.mean([float(l) for l in losses])), time.time() - t0,
            )
        mrr = validate()
        logger.warning("avg valid mrr after epoch %d: %.4f", epoch, mrr)
        tracker.update(epoch + 1, mrr, state)

    return tracker.load_best(state.params)
