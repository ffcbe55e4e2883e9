"""Multi-process (multi-host) training and evaluation loops.

This is the end-user distributed entry the reference gets from
``torch.distributed.launch`` + DDP + DistributedSampler (run.py:32-46,
util.py:84-141), rebuilt single-controller:

- one process per host calls ``multihost.initialize()`` (auto on Cloud TPU);
- each process loads only its shard of the supervision triples
  (``multihost.shard_indices``) and draws negatives from its rank-coupled
  rng (``multihost.per_process_rng``, run.py:234 semantics);
- local batch rows lift into one global sharded jax.Array
  (``multihost.host_local_batch_to_global``) feeding the sharded train step
  (parallel/dp.py) — gradient pmean over the mesh 'data' axis rides
  ICI/DCN inside jit, with optional edge partitioning on the 'edge' axis;
- evaluation shards triples across processes (no shuffle), each process
  ranks its shard locally, and rank vectors concat with one
  process_allgather (``multihost.gather_ranks``; replaces the reference's
  zero-padded all_reduce idiom, run.py:155-186).

Semantics note (intentional delta from the reference): DDP ranks each
remove only their OWN batch rows' easy edges from their graph replica; here
the easy-edge mask covers the whole global batch — every rank replays all
ranks' deterministic rng streams to build it — so train-step numerics are
identical at ANY process count. ``process_count() == 1`` is therefore the
exact parity oracle for a multi-host run (verified by
tests/test_multiprocess.py on a real 2-process CPU cluster).

Compat mode: ``task_cfg["per_rank_easy_edges"] = true`` restores the
reference's per-rank semantics — each data shard masks only its own batch
rows' easy edges (run.py:44-46), so a run matches a world-size-n_data
reference run instead of the single-device one (numerics then depend on
the shard count, exactly as the reference's depend on world size).

Like the reference's DistributedSampler(drop_last=False), shard padding
wraps around, so a handful of duplicated eval triples can be counted twice
when the shard size doesn't divide evenly — same small bias as upstream.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu import tasks
from ultra_tpu.graph import Graph
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.parallel import multihost
from ultra_tpu.parallel.dp import make_sharded_train_step
from ultra_tpu.parallel.mesh import make_mesh
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.train.loop import init_train_state, make_optimizer

logger = logging.getLogger("ultra_tpu")


def evaluate_distributed(
    params,
    cfg: UltraConfig,
    graph: Graph,
    test_triples: np.ndarray,
    filtered_index: tasks.GraphIndex,
    batch_size: int = 8,
    metrics: Iterable[str] = ("mr", "mrr", "hits@1", "hits@3", "hits@10"),
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """Filtered evaluation sharded over processes; every process returns the
    full (identical) metric dict."""
    trips = np.asarray(test_triples)
    if limit is not None and limit < len(trips):
        trips = trips[np.random.default_rng(0).choice(len(trips), size=limit, replace=False)]
    my = multihost.shard_indices(len(trips), epoch=0, shuffle=False)
    rank, neg, rank_t, neg_t = eval_lib.collect_rankings(
        params, cfg, graph, trips[my], filtered_index, batch_size=batch_size
    )
    return eval_lib.compute_metrics(
        metrics,
        multihost.gather_ranks(rank),
        multihost.gather_ranks(neg),
        multihost.gather_ranks(rank_t),
        multihost.gather_ranks(neg_t),
    )


def train_distributed(
    train_cfg: dict,
    task_cfg: dict,
    ultra_cfg: UltraConfig,
    params,
    graph: Graph,
    train_index: tasks.GraphIndex,
    triples: np.ndarray,  # (N, 3) supervision edges (no inverses)
    valid_triples: Optional[np.ndarray] = None,
    valid_graph: Optional[Graph] = None,
    valid_filtered: Optional[tasks.GraphIndex] = None,
    seed: int = 1024,
    lr: float = 5e-4,
    edge_axis: Optional[str] = None,
    mesh=None,
):
    """Distributed train loop (the multi-host twin of runner.train_and_validate).

    ``train_cfg``: batch_size (PER PROCESS, like the reference's per-rank
    DataLoader), num_epoch, batch_per_epoch. ``task_cfg``: num_negative,
    adversarial_temperature, strict_negative. Returns final params
    (replicated; identical on every process)."""
    num_epoch = int(train_cfg.get("num_epoch", 0))
    if num_epoch == 0:
        return params
    batch_size = int(train_cfg.get("batch_size", 8))
    batch_per_epoch = train_cfg.get("batch_per_epoch") or None
    num_negative = int(task_cfg.get("num_negative", 256))
    adv_temp = float(task_cfg.get("adversarial_temperature", 1.0))
    strict = bool(task_cfg.get("strict_negative", True))
    # reference-DDP compat: each data shard removes only its own rows' easy
    # edges (run.py:44-46). Numerics then depend on the shard count, exactly
    # like the reference's depend on world size.
    per_rank = bool(task_cfg.get("per_rank_easy_edges", False))

    world = multihost.process_count()
    pid = multihost.process_index()
    if mesh is None:
        mesh = make_mesh(edge=1)
    n_data = mesh.shape["data"]
    assert (batch_size * world) % n_data == 0, (
        f"global batch {batch_size * world} must divide over data axis {n_data}"
    )

    optimizer = make_optimizer(lr=lr)
    state = init_train_state(params, optimizer)
    step_fn = make_sharded_train_step(
        mesh, ultra_cfg, optimizer, graph,
        adversarial_temperature=adv_temp, num_negative=num_negative,
        edge_axis=edge_axis, per_rank_easy_edges=per_rank,
        grad_accum=int(train_cfg.get("grad_accum", 1)),
    )
    # replicated-by-construction numpy leaves (identical on all processes)
    graph_np = jax.tree.map(np.asarray, graph)

    # every process replays EVERY rank's rng stream so the global easy-edge
    # mask (and thus step numerics) is process-count invariant
    rank_rngs = [np.random.default_rng(seed + p) for p in range(world)]
    steps_per_epoch = batch_per_epoch or math.ceil(len(triples) / (batch_size * world))
    best = None

    for epoch in range(num_epoch):
        t0 = time.time()
        shards = [
            multihost.shard_indices(
                len(triples), epoch=epoch, seed=seed,
                process_id=p, num_processes=world,
            )
            for p in range(world)
        ]
        losses = []
        for step in range(steps_per_epoch):
            all_rows = []
            for p in range(world):
                take = shards[p][(step * batch_size) % len(shards[p]):][:batch_size]
                if len(take) < batch_size:
                    take = np.concatenate([take, shards[p][: batch_size - len(take)]])
                all_rows.append(
                    tasks.negative_sampling(
                        train_index, triples[take], num_negative,
                        strict=strict, rng=rank_rngs[p],
                    )
                )
            global_rows = np.concatenate(all_rows)
            if per_rank:
                # one mask per data shard, from that shard's slice of the
                # global batch (shards are contiguous over the batch axis)
                per_shard = np.array_split(global_rows, n_data)
                ew = np.stack([
                    tasks.easy_edge_weights(
                        train_index, rows, graph.num_edges_padded,
                        remove_one_hop=ultra_cfg.entity_model.remove_one_hop,
                    )
                    for rows in per_shard
                ])
            else:
                ew = tasks.easy_edge_weights(
                    train_index, global_rows, graph.num_edges_padded,
                    remove_one_hop=ultra_cfg.entity_model.remove_one_hop,
                )
            batch_g = multihost.host_local_batch_to_global(mesh, np.asarray(all_rows[pid]))
            state, loss = step_fn(state, graph_np, batch_g, jnp.asarray(ew))
            losses.append(loss)
        logger.warning(
            "[proc %d] epoch %d: avg bce %.6f (%.1fs)", pid, epoch,
            float(np.mean([float(l) for l in losses])), time.time() - t0,
        )
        if valid_triples is not None:
            m = evaluate_distributed(
                state.params, ultra_cfg, valid_graph or graph, valid_triples,
                valid_filtered or train_index, batch_size=batch_size,
                metrics=("mrr",),
            )
            logger.warning("[proc %d] valid after epoch %d: %s", pid, epoch, m)
            if best is None or m["mrr"] > best[0]:
                best = (m["mrr"], jax.tree.map(np.asarray, state.params))

    if best is not None:
        return jax.tree.map(jnp.asarray, best[1])
    return state.params
