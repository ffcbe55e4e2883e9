"""Jitted training step and loss for link prediction.

Replaces the reference's torch loop (/root/reference/script/run.py:25-118):
negative sampling and easy-edge masking happen on the host (data pipeline,
ultra_tpu/tasks.py); the device step is a single jitted function:

    loss = BCE-with-logits(pred, [pos | negs])
    negative weights = softmax(pred_neg / adversarial_temperature) (run.py:67-77)

Optimizer is optax.adamw with torch-AdamW-equivalent hyperparameters.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ultra_tpu.graph import Graph
from ultra_tpu.models.nbfnet import UltraConfig, ultra_apply


def self_adversarial_bce(pred: jax.Array, adversarial_temperature: float, num_negative: int):
    """Per-sample weighted BCE; slot 0 is the positive (run.py:67-77)."""
    target = jnp.zeros_like(pred).at[:, 0].set(1.0)
    loss = optax.sigmoid_binary_cross_entropy(pred, target)  # (B, 1+K)
    if adversarial_temperature > 0:
        neg_weight = jax.nn.softmax(
            jax.lax.stop_gradient(pred[:, 1:]) / adversarial_temperature, axis=-1
        )
    else:
        neg_weight = jnp.full_like(pred[:, 1:], 1.0 / num_negative)
    weight = jnp.concatenate([jnp.ones_like(pred[:, :1]), neg_weight], axis=-1)
    loss = (loss * weight).sum(axis=-1) / weight.sum(axis=-1)
    return loss.mean()


def make_optimizer(lr: float = 5e-4, weight_decay: float = 0.01) -> optax.GradientTransformation:
    """torch.optim.AdamW defaults (betas .9/.999, eps 1e-8, wd 1e-2),
    matching config/transductive/*.yaml optimizer sections."""
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: UltraConfig,
    optimizer: optax.GradientTransformation,
    adversarial_temperature: float = 1.0,
    num_negative: int = 256,
    grad_accum: int = 1,
):
    """Returns jitted (state, graph, batch, edge_weight) -> (state, loss).

    ``edge_weight`` is the per-batch easy-edge mask from
    tasks.easy_edge_weights; pass graph.edge_weight for no dropout.

    ``grad_accum`` > 1 splits the batch into that many sequential
    micro-batches (lax.scan) and averages gradients before one optimizer
    update — numerically the full-batch step (the loss is a mean over
    batch rows, and the easy-edge mask already covers the whole batch, so
    micro-stepping doesn't change which edges are masked). The point on
    TPU: the rspmm feature axis is batch x dim, so pretrain-width batches
    (bs 64 -> F=4096) can run as 2-4 micro-steps on the F<=2048 shapes
    where the v2 kernel wins, while also dividing peak activation HBM by
    the same factor (remat traffic shrinks with it).
    """

    def loss_fn(params, graph: Graph, batch):
        pred = ultra_apply(params, cfg, graph, batch)
        return self_adversarial_bce(pred, adversarial_temperature, num_negative)

    @jax.jit
    def train_step(state: TrainState, graph: Graph, batch, edge_weight):
        graph = graph.replace(edge_weight=edge_weight)
        b = batch.shape[0]
        # configs tune grad_accum for the production batch (e.g. 8 for the
        # bs-64 pretrain); smaller smoke/debug batches clamp to the largest
        # exact split so numerics stay == full batch at any size
        accum = math.gcd(b, grad_accum)
        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, graph, batch)
        else:
            micro = batch.reshape((accum, b // accum) + batch.shape[1:])

            def body(carry, mb):
                loss_sum, acc = carry
                l, g = jax.value_and_grad(loss_fn)(state.params, graph, mb)
                return (loss_sum + l, jax.tree.map(jnp.add, acc, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grads), _ = jax.lax.scan(body, (0.0, zeros), micro)
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_ultra_params(cfg: UltraConfig, key: jax.Array) -> dict:
    """Fresh parameter pytree matching torch's default initializers
    (Linear: kaiming-uniform fan_in, bias U(-1/sqrt(fan_in), ...);
    Embedding: N(0, 1); LayerNorm: ones/zeros)."""

    def linear_init(key, fan_in, fan_out):
        k1, k2 = jax.random.split(key)
        # torch kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
        b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
        return {"w": w, "b": b}

    def nbfnet_init(key, ncfg, project_relations, with_score_mlp):
        keys = jax.random.split(key, 64)
        dims = ncfg.dims
        layers = []
        ki = 0
        for i in range(len(dims) - 1):
            in_mult = 13 if ncfg.aggregate_func == "pna" else 2
            layer = {"linear": linear_init(keys[ki], dims[i] * in_mult, dims[i + 1])}
            ki += 1
            if ncfg.layer_norm:
                layer["layer_norm"] = {
                    "scale": jnp.ones(dims[i + 1]),
                    "bias": jnp.zeros(dims[i + 1]),
                }
            if project_relations:
                p1 = linear_init(keys[ki], dims[i], dims[i])
                ki += 1
                p2 = linear_init(keys[ki], dims[i], dims[i])
                ki += 1
                layer["relation_projection"] = {
                    "w1": p1["w"], "b1": p1["b"], "w2": p2["w"], "b2": p2["b"],
                }
            else:
                layer["relation"] = jax.random.normal(
                    keys[ki], (ncfg.num_relation, dims[i])
                )
                ki += 1
            layers.append(layer)
        params = {"layers": layers}
        if with_score_mlp:
            feature_dim = (
                sum(ncfg.hidden_dims) if ncfg.concat_hidden else ncfg.hidden_dims[-1]
            ) + ncfg.input_dim
            mlp = []
            for i in range(ncfg.num_mlp_layer - 1):
                mlp.append(linear_init(keys[ki], feature_dim, feature_dim))
                ki += 1
            mlp.append(linear_init(keys[ki], feature_dim, 1))
            ki += 1
            params["mlp"] = mlp
        return params

    k1, k2 = jax.random.split(key)
    return {
        "relation_model": nbfnet_init(
            k1, cfg.relation_model, project_relations=False, with_score_mlp=False
        ),
        "entity_model": nbfnet_init(
            k2, cfg.entity_model, project_relations=True, with_score_mlp=True
        ),
    }
