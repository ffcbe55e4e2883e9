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
import os
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


def is_worker_crash(exc) -> bool:
    """True for the TPU-worker 'kernel fault' crash flavor of UNAVAILABLE.
    Bare UNAVAILABLE also covers ordinary tunnel outages (round-3:
    hours-long, supervisor-handled) — only the worker-crash flavor is the
    shape-specific codegen fault crash_diagnostic talks about."""
    return "worker process crashed" in str(exc).lower()


def crash_diagnostic(graphs: "PretrainGraphs", recent, batch_size: int):
    """Turn a TPU-worker crash into an actionable error. Dispatch is
    async, so the UNAVAILABLE may surface one or more steps after the
    faulting program was enqueued — name every recently dispatched member
    shape, not just the last one. Known instance: the XLA layer-norm
    backward faults at specific (V, batch) tile shapes
    (evidence/r5/member3_fault.md); train.grad_accum changes the
    micro-batch shape and sidesteps it with full-batch numerics."""
    seen, shapes = set(), []
    for gi in reversed(recent):
        if gi in seen:
            continue
        seen.add(gi)
        d, g = graphs.datasets[gi], graphs.train_graphs[gi]
        shapes.append(
            f"member {gi} ({d.name}: V={g.num_nodes} R={g.num_relations}"
            f" e_pad={g.num_edges_padded})"
        )
    return RuntimeError(
        f"TPU worker crashed executing a train step; recently "
        f"dispatched (most recent first, async dispatch may lag): "
        f"{'; '.join(shapes)}; batch_size={batch_size}. This is a "
        f"backend codegen fault at one of these shapes, not a data "
        f"error — set train.grad_accum: 2 (micro-batches change the "
        f"faulting shape; numerics stay identical) or change "
        f"batch_size. Resume repeats the epoch from the last "
        f"model_latest/epoch checkpoint. See "
        f"evidence/r5/member3_fault.md."
    )


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
    # supervisor resume contract (same as train/runner.py): the loop saves
    # workdir/model_latest each epoch; scripts/supervise.py relaunches with
    # ULTRA_RESUME_FROM pointing at it after a crash/outage
    resume_from = cfg.get("resume_from")
    if not resume_from:
        env_resume = os.environ.get("ULTRA_RESUME_FROM")
        if env_resume and os.path.exists(env_resume):
            resume_from = env_resume
    if resume_from:
        from ultra_tpu.train.loop import TrainState

        tree = ckpt_lib.load_pytree(
            resume_from,
            like={"params": state.params, "opt_state": state.opt_state},
        )
        state = TrainState(
            jax.tree.map(jnp.asarray, tree["params"]),
            jax.tree.map(jnp.asarray, tree["opt_state"]),
            state.step,
        )
        logger.warning("resumed pretrain state from %s", resume_from)
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
    recent: list = []  # member indices of recently dispatched steps
    for block_start in range(0, num_epoch, epoch_block):
        for epoch in range(block_start, min(num_epoch, block_start + epoch_block)):
            t0 = time.time()
            losses = []
            try:
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
                    recent = (recent + [gi])[-8:]
                    state, loss = step_fn(
                        state, graphs.train_graphs[gi], jnp.asarray(batch), jnp.asarray(ew)
                    )
                    losses.append(loss)
                    if step % log_interval == 0:
                        logger.warning("epoch %d step %d loss %.6f", epoch, step, float(loss))
                # the float() forces every step of the epoch to completion
                # INSIDE the try — async dispatch cannot carry a crash past
                # this point
                logger.warning(
                    "epoch %d: avg bce %.6f (%.1fs)", epoch,
                    float(np.mean([float(l) for l in losses])), time.time() - t0,
                )
            except jax.errors.JaxRuntimeError as exc:
                if not is_worker_crash(exc):
                    raise
                raise crash_diagnostic(graphs, recent, batch_size) from exc
            ckpt_lib.save_pytree(
                os.path.join(workdir, "model_latest"),
                {"params": state.params, "opt_state": state.opt_state},
            )
        mrr = validate()
        logger.warning("avg valid mrr after epoch %d: %.4f", epoch, mrr)
        tracker.update(epoch + 1, mrr, state)

    return tracker.load_best(state.params)
