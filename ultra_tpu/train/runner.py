"""High-level train/eval orchestration — the TPU rewrite of
script/run.py:25-118 and script/pretrain.py.

The host side runs the data pipeline (negative sampling, easy-edge masks,
filtered-mask construction — all numpy, ultra_tpu/tasks.py); the device side
is one jitted train step / eval scorer per graph shape. Checkpointing is
orbax with best-by-valid-MRR selection (utils/ckpt.py).
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu import tasks
from ultra_tpu.data import kg
from ultra_tpu.graph import Graph, pad_bucket
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.train.loop import (
    TrainState,
    init_train_state,
    init_ultra_params,
    make_optimizer,
    make_train_step,
)
from ultra_tpu.utils import ckpt as ckpt_lib

logger = logging.getLogger("ultra_tpu")


def model_config_from_dict(model_cfg: dict) -> UltraConfig:
    """YAML model section -> UltraConfig (mirrors Ultra.__init__ globals()
    class dispatch, models.py:14-15)."""

    def nbf(cfg: dict, project_relations: bool) -> NBFNetConfig:
        cfg = dict(cfg)
        cfg.pop("class", None)
        return NBFNetConfig(
            input_dim=cfg.get("input_dim", 64),
            hidden_dims=tuple(cfg.get("hidden_dims", (64,) * 6)),
            num_relation=4 if not project_relations else 1,
            message_func=cfg.get("message_func", "distmult"),
            aggregate_func=cfg.get("aggregate_func", "sum"),
            short_cut=bool(cfg.get("short_cut", True)),
            layer_norm=bool(cfg.get("layer_norm", True)),
            activation=cfg.get("activation", "relu"),
            concat_hidden=bool(cfg.get("concat_hidden", False)),
            num_mlp_layer=int(cfg.get("num_mlp_layer", 2)),
            remove_one_hop=bool(cfg.get("remove_one_hop", False)),
            remat=bool(cfg.get("remat", False)),
            compute_dtype=cfg.get("compute_dtype"),
            precision=cfg.get("precision"),
            project_relations=project_relations,
        )

    return UltraConfig(
        relation_model=nbf(model_cfg["relation_model"], project_relations=False),
        entity_model=nbf(model_cfg["entity_model"], project_relations=True),
    )


def use_pallas_default() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def prepare_graph(split: kg.KGSplit, with_plans: Optional[bool] = None,
                  v2_sort_slots: bool = False) -> Graph:
    if with_plans is None:
        with_plans = use_pallas_default()
    e = split.edge_index.shape[1]
    # the relation graph's edge count is data-dependent (up to 4*R^2);
    # bucket the real count — padding to ~4*R crashed on any graph whose
    # relations co-occur densely (caught by the round-3 on-chip CLI run)
    return kg.split_to_graph(
        split,
        pad_edges_to=pad_bucket(e, 2048),
        pad_rel_edges_bucket=1024,
        with_plans=with_plans,
        v2_sort_slots=v2_sort_slots,
    )


def build_filtered_index(
    dataset: kg.KGDataset, dataset_name: str, task_name: str
) -> Dict[str, tasks.GraphIndex]:
    """Validation/test filtering graphs (run.py:263-291)."""
    train, valid, test = dataset.train, dataset.valid, dataset.test
    if task_name == "InductiveInference":
        if dataset_name in kg.INDUCTIVE_FILTER_WITH_INFERENCE:
            ei = np.concatenate(
                [valid.edge_index, valid.target_edge_index, test.target_edge_index], axis=1
            )
            et = np.concatenate(
                [valid.edge_type, valid.target_edge_type, test.target_edge_type]
            )
            idx = tasks.GraphIndex.build(ei, et, test.num_nodes, test.num_relations)
            return {"valid": idx, "test": idx}
        test_ei = np.concatenate([test.edge_index, test.target_edge_index], axis=1)
        test_et = np.concatenate([test.edge_type, test.target_edge_type])
        val_ei = np.concatenate([train.edge_index, valid.target_edge_index], axis=1)
        val_et = np.concatenate([train.edge_type, valid.target_edge_type])
        return {
            "valid": tasks.GraphIndex.build(
                val_ei, val_et, valid.num_nodes, valid.num_relations
            ),
            "test": tasks.GraphIndex.build(
                test_ei, test_et, test.num_nodes, test.num_relations
            ),
        }
    # transductive: all target edges of all splits (run.py:287)
    ei = np.concatenate(
        [train.target_edge_index, valid.target_edge_index, test.target_edge_index], axis=1
    )
    et = np.concatenate(
        [train.target_edge_type, valid.target_edge_type, test.target_edge_type]
    )
    idx = tasks.GraphIndex.build(ei, et, train.num_nodes, train.num_relations)
    return {"valid": idx, "test": idx}


def triples_of(split: kg.KGSplit) -> np.ndarray:
    return np.concatenate(
        [split.target_edge_index, split.target_edge_type[None]], axis=0
    ).T.copy()


def default_metrics(dataset_name: str, metrics: Sequence[str]):
    if dataset_name in kg.TAIL_ONLY_EVAL:
        return [f"{m}-tail" for m in metrics]
    return list(metrics)


def train_and_validate(
    cfg,
    ultra_cfg: UltraConfig,
    params,
    graphs: Dict[str, Graph],
    dataset: kg.KGDataset,
    filtered: Dict[str, tasks.GraphIndex],
    workdir: str,
    seed: int = 1024,
    dataset_name: str = "",
):
    """Single-dataset training loop (run.py:25-118)."""
    train_cfg = cfg["train"]
    task_cfg = cfg["task"]
    num_epoch = int(train_cfg.get("num_epoch", 0))
    if num_epoch == 0:
        return params

    batch_size = int(train_cfg.get("batch_size", 8))
    batch_per_epoch = train_cfg.get("batch_per_epoch") or None
    num_negative = int(task_cfg.get("num_negative", 256))
    adv_temp = float(task_cfg.get("adversarial_temperature", 1.0))
    strict = bool(task_cfg.get("strict_negative", True))

    optimizer = make_optimizer(lr=float(cfg["optimizer"].get("lr", 5e-4)))
    state = init_train_state(params, optimizer)
    resume_from = cfg.get("resume_from")
    if not resume_from:
        # supervisor override (scripts/supervise.py): resume only when the
        # crash checkpoint actually exists (first launch has none)
        env_resume = os.environ.get("ULTRA_RESUME_FROM")
        if env_resume and os.path.exists(env_resume):
            resume_from = env_resume
    if resume_from:
        # full optimizer-state resume of an interrupted run — the reference
        # only reloads model weights (SURVEY.md §5 checkpoint/resume gap)
        tree = ckpt_lib.load_pytree(
            resume_from, like={"params": state.params, "opt_state": state.opt_state}
        )
        state = TrainState(
            jax.tree.map(jnp.asarray, tree["params"]),
            jax.tree.map(jnp.asarray, tree["opt_state"]),
            state.step,
        )
        logger.warning("resumed train state from %s", resume_from)
    step_fn = make_train_step(
        ultra_cfg, optimizer, adversarial_temperature=adv_temp,
        num_negative=num_negative,
        grad_accum=int(train_cfg.get("grad_accum", 1)),
    )

    train_graph = graphs["train"]
    train_index = tasks.GraphIndex.build(
        dataset.train.edge_index,
        dataset.train.edge_type,
        dataset.train.num_nodes,
        dataset.train.num_relations,
    )
    triples = triples_of(dataset.train)
    rng = np.random.default_rng(seed)
    tracker = ckpt_lib.BestModelTracker(workdir)

    steps_per_epoch = batch_per_epoch or math.ceil(len(triples) / batch_size)
    epoch_block = math.ceil(num_epoch / 10)
    fast_valid = train_cfg.get("fast_test")
    # crash resilience: periodic step-level checkpoint (resume_from target);
    # the reference only checkpoints at epoch blocks (run.py:97-104)
    ckpt_interval = train_cfg.get("checkpoint_interval_steps")

    epoch = 0
    for block_start in range(0, num_epoch, epoch_block):
        for epoch in range(block_start, min(num_epoch, block_start + epoch_block)):
            perm = rng.permutation(len(triples))
            losses = []
            t0 = time.time()
            for step in range(steps_per_epoch):
                take = perm[(step * batch_size) % len(triples) :][:batch_size]
                if len(take) < batch_size:
                    take = np.concatenate([take, perm[: batch_size - len(take)]])
                batch_triples = triples[take]
                batch = tasks.negative_sampling(
                    train_index, batch_triples, num_negative, strict=strict, rng=rng
                )
                ew = tasks.easy_edge_weights(
                    train_index, batch, train_graph.num_edges_padded,
                    remove_one_hop=ultra_cfg.entity_model.remove_one_hop,
                )
                state, loss = step_fn(
                    state, train_graph, jnp.asarray(batch), jnp.asarray(ew)
                )
                losses.append(loss)
                if ckpt_interval and (step + 1) % int(ckpt_interval) == 0:
                    ckpt_lib.save_pytree(
                        os.path.join(workdir, "model_latest"),
                        {"params": state.params, "opt_state": state.opt_state},
                    )
            losses = [float(l) for l in losses]
            logger.warning(
                "epoch %d: avg bce %.6f (%.1fs, %d steps)",
                epoch, float(np.mean(losses)), time.time() - t0, steps_per_epoch,
            )

        val_metrics = eval_lib.evaluate(
            state.params,
            ultra_cfg,
            graphs["valid"],
            triples_of(dataset.valid),
            filtered["valid"],
            batch_size=batch_size,
            metrics=("mrr",),
            limit=fast_valid,
        )
        logger.warning("valid after epoch %d: %s", epoch, val_metrics)
        tracker.update(epoch + 1, val_metrics["mrr"], state)

    params = tracker.load_best(state.params)
    return params


def run_link_prediction(
    cfg: dict,
    workdir: str,
    seed: int = 1024,
    checkpoint: Optional[str] = None,
    with_plans: Optional[bool] = None,
) -> Dict[str, Dict[str, float]]:
    """Full run: dataset -> (train) -> valid/test metrics. Returns metrics."""
    os.makedirs(workdir, exist_ok=True)
    ds_cfg = dict(cfg["dataset"])
    ds_name = ds_cfg.pop("class")
    root = os.path.expanduser(ds_cfg.pop("root", os.path.join(workdir, "kg-datasets")))
    dataset = kg.build_dataset(ds_name, root, **ds_cfg).load()

    ultra_cfg = model_config_from_dict(cfg["model"])
    params = (
        ckpt_lib.load_model_checkpoint(checkpoint)
        if checkpoint
        else init_ultra_params(ultra_cfg, jax.random.key(seed))
    )

    from ultra_tpu.models.nbfnet import sum_only_aggregators

    sort_v2 = sum_only_aggregators(ultra_cfg)
    graphs = {
        "train": prepare_graph(dataset.train, with_plans, v2_sort_slots=sort_v2),
        "valid": prepare_graph(dataset.valid, with_plans, v2_sort_slots=sort_v2),
        "test": prepare_graph(dataset.test, with_plans, v2_sort_slots=sort_v2),
    }
    task_name = cfg["task"].get("name", "TransductiveInference")
    filtered = build_filtered_index(dataset, ds_name, task_name)

    metrics_list = default_metrics(ds_name, cfg["task"].get("metric", ("mr", "mrr", "hits@10")))
    batch_size = int(cfg["train"].get("batch_size", 8))

    if jax.process_count() > 1:
        # multi-host: per-process data shards, sharded train step, allgather
        # eval (the torch.distributed.launch path of the reference)
        from ultra_tpu.train.distributed import evaluate_distributed, train_distributed

        train_index = tasks.GraphIndex.build(
            dataset.train.edge_index, dataset.train.edge_type,
            dataset.train.num_nodes, dataset.train.num_relations,
        )
        params = train_distributed(
            cfg["train"], cfg["task"], ultra_cfg, params,
            graphs["train"], train_index, triples_of(dataset.train),
            valid_triples=triples_of(dataset.valid),
            valid_graph=graphs["valid"], valid_filtered=filtered["valid"],
            seed=seed, lr=float(cfg["optimizer"].get("lr", 5e-4)),
        )
        results = {}
        for split in ("valid", "test"):
            results[split] = evaluate_distributed(
                params, ultra_cfg, graphs[split],
                triples_of(getattr(dataset, split)), filtered[split],
                batch_size=batch_size, metrics=metrics_list,
            )
            logger.warning("%s metrics: %s", split, results[split])
        return results

    try:
        params = train_and_validate(
            cfg, ultra_cfg, params, graphs, dataset, filtered, workdir,
            seed=seed, dataset_name=ds_name,
        )
    except Exception as exc:  # noqa: BLE001 — auto-remat on HBM OOM
        if "Ran out of memory" not in str(exc) and "RESOURCE_EXHAUSTED" not in str(exc):
            raise
        if ultra_cfg.relation_model.remat and ultra_cfg.entity_model.remat:
            raise
        # the train step's activations are O(layers * V * B * D); remat
        # drops that to O(V * B * D) at ~2x fwd flops. OOM happens at
        # compile time (step 0), so no training progress is lost.
        import dataclasses

        logger.warning(
            "train step OOMed HBM (%s...); retrying with remat: yes — set "
            "model.{relation_model,entity_model}.remat explicitly to avoid "
            "the doubled first compile", str(exc)[:120],
        )
        ultra_cfg = dataclasses.replace(
            ultra_cfg,
            relation_model=dataclasses.replace(
                ultra_cfg.relation_model, remat=True),
            entity_model=dataclasses.replace(
                ultra_cfg.entity_model, remat=True),
        )
        params = train_and_validate(
            cfg, ultra_cfg, params, graphs, dataset, filtered, workdir,
            seed=seed, dataset_name=ds_name,
        )

    results = {}
    for split in ("valid", "test"):
        results[split] = eval_lib.evaluate(
            params,
            ultra_cfg,
            graphs[split],
            triples_of(getattr(dataset, split)),
            filtered[split],
            batch_size=batch_size,
            metrics=metrics_list,
        )
        logger.warning("%s metrics: %s", split, results[split])
    return results
