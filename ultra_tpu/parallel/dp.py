"""Sharded training step: data parallelism over queries x edge partitioning
of the graph, via shard_map over a (data, edge) mesh.

This replaces the reference's DDP wrapper (run.py:44-46) and goes beyond it:
the reference keeps a full graph replica per GPU (SURVEY.md §2.8); here the
edge arrays can be row-sharded across the 'edge' axis, with one XLA
collective per conv layer combining partial node aggregates over ICI.

Gradient correctness: the *loss* (not the step) is wrapped in shard_map —
inside, each shard computes its local-batch loss over its local edge shard,
the per-layer ``psum``/``pmax`` over 'edge' builds replicated activations,
and a final ``pmean`` over 'data' produces the replicated global loss.
``jax.value_and_grad`` is applied OUTSIDE the shard_map: JAX differentiates
through the collectives (psum/pmean transpose correctly), so parameter
gradients come out globally correct and replicated with no manual gradient
bookkeeping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ultra_tpu.graph import Graph
from ultra_tpu.models.nbfnet import UltraConfig, ultra_apply, ultra_score_all
from ultra_tpu.parallel.mesh import graph_pspec
from ultra_tpu.train.loop import TrainState, self_adversarial_bce


def _local_plans(graph: Graph, plans_sharded: bool) -> Graph:
    """Inside shard_map the stacked plan arrays arrive as (1, ...) slices —
    drop the shard axis to recover plain per-shard plans."""
    if not plans_sharded or graph.plans is None:
        return graph
    plans = jax.tree.map(lambda a: a[0], graph.plans)
    plans = plans.replace(num_shards=0)
    return graph.replace(plans=plans)


def _sharded_cfg(
    cfg: UltraConfig, edge_axis: Optional[str], sharded_plans: bool = False
) -> UltraConfig:
    """Entity-graph convs combine over the edge axis; the relation graph is
    replicated so its convs do not."""
    return cfg.replace(
        entity_model=cfg.entity_model.replace(
            edge_axis=edge_axis, sharded_plans=sharded_plans
        )
    )


def make_sharded_train_step(
    mesh: Mesh,
    cfg: UltraConfig,
    optimizer: optax.GradientTransformation,
    graph: Graph,
    adversarial_temperature: float = 1.0,
    num_negative: int = 256,
    edge_axis: Optional[str] = "edge",
    data_axis: str = "data",
    per_rank_easy_edges: bool = False,
    grad_accum: int = 1,
):
    """Returns jitted (state, graph, batch, edge_weight) -> (state, loss).

    batch: (B, 1+K, 3) global; B must divide the data-axis size.
    edge_weight: (E_pad,) easy-edge mask (tasks.easy_edge_weights).

    ``per_rank_easy_edges``: reference-DDP compat mode — each data shard
    masks only its OWN batch rows' easy edges (run.py:44-46 semantics,
    where every GPU edits its private graph replica). ``edge_weight`` then
    has shape (n_data, E_pad), row s built from data shard s's rows. The
    default (False) masks the whole global batch on every shard, which
    keeps numerics process-count invariant; the compat mode instead
    matches a world-size-N reference run bit-for-bit (modulo dtype).
    """
    plans_sharded = (
        graph.plans is not None and getattr(graph.plans, "num_shards", 0) > 0
    )
    inner_cfg = _sharded_cfg(cfg, edge_axis, plans_sharded)
    gspec = graph_pspec(graph, edge_axis)
    wspec = P() if plans_sharded else P(edge_axis)
    if per_rank_easy_edges:
        wspec = P(data_axis) if plans_sharded else P(data_axis, edge_axis)

    def local_loss(params, graph_shard: Graph, batch, edge_weight):
        graph_shard = _local_plans(graph_shard, plans_sharded)
        if per_rank_easy_edges:
            edge_weight = edge_weight[0]  # (1, E) slice -> this shard's mask
        graph_shard = graph_shard.replace(edge_weight=edge_weight)
        pred = ultra_apply(params, inner_cfg, graph_shard, batch)
        loss = self_adversarial_bce(pred, adversarial_temperature, num_negative)
        return jax.lax.pmean(loss, data_axis)  # replicated global loss

    sharded_loss = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), gspec, P(data_axis), wspec),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def train_step(state: TrainState, graph: Graph, batch, edge_weight):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(sharded_loss)(
                state.params, graph, batch, edge_weight
            )
        else:
            # sequential micro-batches along the batch axis (each still
            # sharded over 'data'); grads averaged before one update —
            # same numerics as the full batch (train/loop.py grad_accum)
            b = batch.shape[0]
            assert b % grad_accum == 0, (b, grad_accum)
            micro = batch.reshape((grad_accum, b // grad_accum) + batch.shape[1:])

            def body(carry, mb):
                loss_sum, acc = carry
                l, g = jax.value_and_grad(sharded_loss)(
                    state.params, graph, mb, edge_weight
                )
                return (loss_sum + l, jax.tree.map(jnp.add, acc, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grads), _ = jax.lax.scan(body, (0.0, zeros), micro)
            loss = loss_sum / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_sharded_score_step(
    mesh: Mesh,
    cfg: UltraConfig,
    graph: Graph,
    edge_axis: Optional[str] = "edge",
    data_axis: str = "data",
):
    """Jitted sharded eval scorer: (params, graph, batch(B,3)) -> (B,V) x2."""
    plans_sharded = (
        graph.plans is not None and getattr(graph.plans, "num_shards", 0) > 0
    )
    inner_cfg = _sharded_cfg(cfg, edge_axis, plans_sharded)
    gspec = graph_pspec(graph, edge_axis)

    def score(params, graph_shard: Graph, batch):
        graph_shard = _local_plans(graph_shard, plans_sharded)
        h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
        num_direct = graph_shard.num_relations // 2
        t_pred = ultra_score_all(params, inner_cfg, graph_shard, h, r_index=r)
        h_pred = ultra_score_all(
            params, inner_cfg, graph_shard, t, r_index=r + num_direct, query_r_index=r
        )
        return t_pred, h_pred

    sharded = shard_map(
        score,
        mesh=mesh,
        in_specs=(P(), gspec, P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(params, graph_in, batch):
        # eval-only factory: trace under the forward-only stream budget
        # (unslice-if-it-fits; per-closure jit cache, so no poisoning)
        from ultra_tpu.ops import rspmm_pallas_v2 as _v2

        with _v2.stream_budget(_v2.EVAL_SLICE_BYTES):
            return jitted(params, graph_in, batch)

    return run
