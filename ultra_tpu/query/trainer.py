"""UltraQuery training and evaluation loops — rewrite of script/run_query.py.

Loss (run_query.py:96-113): BCE over all nodes against the easy-answer mask;
positive positions weighted 1/num_positive per query, negative positions by
a self-adversarial softmax over that query's negatives.

Training-time traversal dropout runs on the host (query/executor.py
simulate_symbolic) and reaches the device as per-slot graphs with static
shapes. Evaluation computes filtered hard-answer rankings per batch
(query/metrics.py) and rolls up per-type / EPFO / negation metrics.
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
import optax

from ultra_tpu.graph import Graph, pad_bucket, make_graph
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.query import metrics as qmetrics
from ultra_tpu.query import ops
from ultra_tpu.query.datasets import QueryDataset, QueryGraph
from ultra_tpu.query.executor import (
    DropoutPlanner,
    QueryConfig,
    execute,
    execute_grouped,
    graphs_for_slots,
    pad_round_schedule,
    projection_schedule,
    simulate_symbolic,
    simulate_symbolic_grouped,
)
from ultra_tpu import tasks
from ultra_tpu.train.loop import TrainState, init_train_state, make_optimizer
from ultra_tpu.utils import ckpt as ckpt_lib

logger = logging.getLogger("ultra_tpu")


def _variant_tracker(name: str):
    """Track distinct jit-cache keys of a grouped query step and log each
    new variant with its first-call (compile-inclusive) wall time — the
    cold-compile accounting for mixed pretraining mixtures (each distinct
    (n_rounds, batch shape, graph shape) mints one XLA program; round
    bucketing in pad_round_schedule caps the n_rounds dimension)."""
    seen: set = set()

    def check(n_rounds, kind_shape, graph):
        key = (
            n_rounds, tuple(kind_shape),
            graph.num_nodes, graph.num_edges_padded,
            None if graph.relation_graph is None
            else graph.relation_graph.num_edges_padded,
        )
        if key in seen:
            return None
        seen.add(key)
        logger.warning(
            "%s: jit variant %d (n_rounds=%d batch=%s V=%d E_pad=%d) — "
            "expect a cold compile", name, len(seen), n_rounds,
            tuple(kind_shape), graph.num_nodes, graph.num_edges_padded,
        )
        return time.time()

    def done(t0, n_variants_msg=""):
        logger.warning(
            "%s: first step (incl. compile) took %.1fs%s",
            name, time.time() - t0, n_variants_msg,
        )

    return check, done


def prepare_query_graph(
    qg: QueryGraph, rel_pad_to: Optional[int] = None,
    with_plans: Optional[bool] = None, v2_sort_slots: bool = False,
) -> Graph:
    """QueryGraph -> device Graph (+ relation graph). Query graphs already
    contain inverse relations — no augmentation (datasets_query.py:103-109).

    ``with_plans`` (default: on TPU backends) attaches Pallas rspmm plans;
    the relation-graph plan is chunk-padded so per-slot dropout rebuilds in
    training keep a stable jit trace.
    """
    if with_plans is None:
        import jax as _jax

        with_plans = _jax.default_backend() in ("tpu", "axon")
    rel_ei, rel_et = tasks.build_relation_graph_arrays(
        qg.edge_index, qg.edge_type, qg.num_nodes, qg.num_relations
    )
    if rel_pad_to is None:
        rel_pad_to = pad_bucket(rel_ei.shape[1], 1024)
    rel_graph = make_graph(
        rel_ei, rel_et, num_nodes=qg.num_relations, num_relations=4, pad_to=rel_pad_to
    )
    graph = make_graph(
        qg.edge_index,
        qg.edge_type,
        num_nodes=qg.num_nodes,
        num_relations=qg.num_relations,
        pad_to=pad_bucket(qg.edge_index.shape[1], 2048),
        relation_graph=rel_graph,
    )
    if with_plans:
        from ultra_tpu.ops.rspmm_pallas import attach_plans

        def host_padded(ei, et, e_pad):
            e = ei.shape[1]
            return (
                np.pad(np.asarray(ei, np.int64), ((0, 0), (0, e_pad - e))),
                np.pad(np.asarray(et, np.int64), (0, e_pad - e)),
                np.pad(np.ones(e, np.float32), (0, e_pad - e)),
            )

        rel_graph = attach_plans(
            rel_graph, rb=128, chunk=128,
            host_edges=host_padded(rel_ei, rel_et, rel_graph.num_edges_padded),
        )
        graph = attach_plans(
            graph,
            host_edges=host_padded(qg.edge_index, qg.edge_type, graph.num_edges_padded),
            v2_sort_slots=v2_sort_slots,
        )
        graph = graph.replace(relation_graph=rel_graph)
    return graph


def answers_to_mask(answers: Sequence[np.ndarray], num_nodes: int) -> np.ndarray:
    out = np.zeros((len(answers), num_nodes), dtype=bool)
    for i, a in enumerate(answers):
        if len(a):
            out[i, a] = True
    return out


def query_bce_loss(pred, target, adversarial_temperature: float):
    """pred (B, V) logits, target (B, V) in {0,1} (easy answers).

    Matches run_query.py:96-113: positive weight 1/num_pos; negatives get a
    softmax over each row's negative logits.
    """
    loss = optax.sigmoid_binary_cross_entropy(pred, target)
    is_pos = target > 0.5
    is_neg = ~is_pos
    num_pos = jnp.maximum(is_pos.sum(axis=-1, keepdims=True), 1)
    pos_w = jnp.where(is_pos, 1.0 / num_pos, 0.0)
    if adversarial_temperature > 0:
        logits = jnp.where(
            is_neg, jax.lax.stop_gradient(pred) / adversarial_temperature, -jnp.inf
        )
        neg_w = jax.nn.softmax(logits, axis=-1)
        neg_w = jnp.where(is_neg, neg_w, 0.0)
    else:
        num_neg = jnp.maximum(is_neg.sum(axis=-1, keepdims=True), 1)
        neg_w = jnp.where(is_neg, 1.0 / num_neg, 0.0)
    weight = pos_w + neg_w
    per_query = (loss * weight).sum(axis=-1) / weight.sum(axis=-1)
    return per_query.mean()


def make_query_train_step(
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    optimizer: optax.GradientTransformation,
    adversarial_temperature: float = 1.0,
):
    @jax.jit
    def step(state: TrainState, slot_graphs, kind, operand, target):
        def loss_fn(params):
            pred = execute(params, ultra_cfg, qcfg, slot_graphs, kind, operand)
            return query_bce_loss(pred, target, adversarial_temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_grouped_query_train_step(
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    optimizer: optax.GradientTransformation,
    adversarial_temperature: float = 1.0,
    grad_accum: int = 1,
):
    """Training step with projections grouped into max-projections-per-query
    GNN rounds (train.grouped_projections: the reference scheduler's
    grouping, with ONE traversal-dropout mask per round from
    simulate_symbolic_grouped — the reference's own dropout granularity,
    ultraquery.py:196-203). ~2x fewer GNN calls than the per-slot step on
    mixed batches; the jit cache is keyed by n_rounds, BUCKETED via
    pad_round_schedule (standard BetaE types chain <= 3 projections so
    buckets (1,2,3) never pad); each new compiled variant is logged with
    its first-step wall time.

    ``grad_accum`` > 1 splits the query batch into sequential micro-batches
    (round graphs — one dropout mask per round — stay shared, so numerics
    equal the full batch: the loss is a mean over per-query rows).
    Micro-batching divides peak activation HBM by the same factor — the
    lever that let link-prediction pretraining drop remat entirely
    (ROOFLINE round-5)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n_rounds",))
    def step(state: TrainState, round_graphs, kind, operand,
             round_of, has_proj, arg_slot, n_rounds, target):
        def loss_fn(params, kind, operand, round_of, has_proj, arg_slot,
                    target):
            pred = execute_grouped(
                params, ultra_cfg, qcfg, list(round_graphs), kind, operand,
                round_of, has_proj, arg_slot, n_rounds,
            )
            return query_bce_loss(pred, target, adversarial_temperature)

        b = kind.shape[0]
        # clamp to the largest exact split (configs tune for the production
        # batch; smoke batches stay numerically identical at any size)
        accum = math.gcd(b, grad_accum)
        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, kind, operand, round_of, has_proj, arg_slot,
                target,
            )
        else:
            def split(a):
                return a.reshape((accum, b // accum) + a.shape[1:])

            micro = tuple(
                split(a) for a in (kind, operand, round_of, has_proj,
                                   arg_slot, target)
            )

            def body(carry, mb):
                loss_sum, acc = carry
                l, g = jax.value_and_grad(loss_fn)(state.params, *mb)
                return (loss_sum + l, jax.tree.map(jnp.add, acc, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grads), _ = jax.lax.scan(body, (0.0, zeros), micro)
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    check_variant, log_compile = _variant_tracker("grouped_query_train_step")

    def run(state, round_graphs, kind, operand, target):
        round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
        has_proj, arg_slot, n_rounds, round_graphs = pad_round_schedule(
            has_proj, arg_slot, n_rounds, round_graphs
        )
        t0 = check_variant(n_rounds, kind.shape, round_graphs[0])
        out = step(
            state, tuple(round_graphs), jnp.asarray(kind), jnp.asarray(operand),
            jnp.asarray(round_of), jnp.asarray(has_proj),
            jnp.asarray(arg_slot), n_rounds, jnp.asarray(target),
        )
        if t0 is not None:
            jax.block_until_ready(out[1])
            log_compile(t0)
        return out

    return run


def make_sharded_grouped_query_train_step(
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    adversarial_temperature: float = 1.0,
    data_axis: str = "data",
):
    """Data-parallel twin of make_grouped_query_train_step: queries shard
    over the mesh '{data}' axis, the per-round graphs (one dropout mask per
    round, replicated) are shared by every shard — numerics equal the
    single-device grouped step on the same global batch."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_loss(params, round_graphs, kind, operand,
                   round_of, has_proj, arg_slot, target, *, n_rounds):
        pred = execute_grouped(
            params, ultra_cfg, qcfg, list(round_graphs), kind, operand,
            round_of, has_proj, arg_slot, n_rounds,
        )
        loss = query_bce_loss(pred, target, adversarial_temperature)
        return jax.lax.pmean(loss, data_axis)

    @functools.partial(jax.jit, static_argnames=("n_rounds",))
    def step(state: TrainState, round_graphs, kind, operand,
             round_of, has_proj, arg_slot, n_rounds, target):
        gspec = jax.tree.map(lambda _: P(), tuple(round_graphs))
        sharded = shard_map(
            functools.partial(local_loss, n_rounds=n_rounds),
            mesh=mesh,
            in_specs=(P(), gspec, P(data_axis), P(data_axis),
                      P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
            out_specs=P(),
            check_vma=False,
        )
        loss, grads = jax.value_and_grad(
            lambda p: sharded(p, tuple(round_graphs), kind, operand,
                              round_of, has_proj, arg_slot, target)
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    check_variant, log_compile = _variant_tracker("sharded_grouped_query_train_step")

    def run(state, round_graphs, kind, operand, target):
        round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
        has_proj, arg_slot, n_rounds, round_graphs = pad_round_schedule(
            has_proj, arg_slot, n_rounds, round_graphs
        )
        t0 = check_variant(n_rounds, kind.shape, round_graphs[0])
        out = step(
            state, tuple(round_graphs), jnp.asarray(kind), jnp.asarray(operand),
            jnp.asarray(round_of), jnp.asarray(has_proj),
            jnp.asarray(arg_slot), n_rounds, jnp.asarray(target),
        )
        if t0 is not None:
            jax.block_until_ready(out[1])
            log_compile(t0)
        return out

    return run


def make_sharded_query_train_step(
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    adversarial_temperature: float = 1.0,
    data_axis: str = "data",
):
    """Data-parallel UltraQuery train step over a device mesh (the
    reference's DDP wrap of run_query.py:71-74, rebuilt with shard_map).

    Queries (kind/operand/target rows) shard over the mesh '{data}' axis;
    the graph, per-slot dropout weights, and parameters are replicated, so
    numerics equal the single-device step on the same global batch (dropout
    here is per-batch, exactly like the single-process trainer — not the
    reference's per-rank dropout). The projection lax.cond diverges freely
    per device (no collectives inside), and the loss pmean over '{data}'
    makes jax.value_and_grad produce replicated global gradients."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_loss(params, slot_graphs, kind, operand, target):
        pred = execute(params, ultra_cfg, qcfg, list(slot_graphs), kind, operand)
        loss = query_bce_loss(pred, target, adversarial_temperature)
        return jax.lax.pmean(loss, data_axis)

    def graph_spec(graphs):
        return jax.tree.map(lambda _: P(), graphs)

    def make(slot_graphs):
        sharded = shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), graph_spec(tuple(slot_graphs)), P(data_axis),
                      P(data_axis), P(data_axis)),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def step(state: TrainState, slot_graphs, kind, operand, target):
            loss, grads = jax.value_and_grad(sharded)(
                state.params, tuple(slot_graphs), kind, operand, target
            )
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return step

    return make


def make_per_rank_query_train_step(
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    adversarial_temperature: float = 1.0,
    data_axis: str = "data",
):
    """Reference-DDP compat twin of make_sharded_query_train_step: every
    data shard applies its OWN traversal-dropout masks (the reference draws
    per-rank dropout under DDP, ultraquery.py:34-83 + run.py:234 rank-coupled
    seeding), instead of the default replicated per-batch masks.

    Step signature: (state, base_graph, slot_ew (S, n_data, E_pad),
    slot_rel_ew (S, n_data, E_rel_pad), kind, operand, target) — the stacked
    weight tensors shard over '{data}' on axis 1; slots without dropout
    carry the base weights. Requires the DropoutPlanner fast path (relation
    edits as weight masks over the shared base relation graph)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_loss(params, base_graph, slot_ew, slot_rel_ew, kind, operand, target):
        graphs = []
        for i in range(slot_ew.shape[0]):
            rg = base_graph.relation_graph.replace(edge_weight=slot_rel_ew[i, 0])
            graphs.append(
                base_graph.replace(edge_weight=slot_ew[i, 0], relation_graph=rg)
            )
        pred = execute(params, ultra_cfg, qcfg, graphs, kind, operand)
        loss = query_bce_loss(pred, target, adversarial_temperature)
        return jax.lax.pmean(loss, data_axis)

    def make(base_graph):
        gspec = jax.tree.map(lambda _: P(), base_graph)
        sharded = shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), gspec, P(None, data_axis), P(None, data_axis),
                      P(data_axis), P(data_axis), P(data_axis)),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def step(state: TrainState, base_graph, slot_ew, slot_rel_ew,
                 kind, operand, target):
            loss, grads = jax.value_and_grad(sharded)(
                state.params, base_graph, slot_ew, slot_rel_ew,
                kind, operand, target,
            )
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return step

    return make


def per_rank_slot_weights(
    base_graph: Graph,
    plans: Sequence,  # one SymbolicPlan per data shard
) -> tuple:
    """Stack per-shard SymbolicPlans into the (S, n_data, E) weight tensors
    make_per_rank_query_train_step expects; None slots get base weights."""
    n = len(plans)
    s = len(plans[0].slot_weights)
    ew_base = np.asarray(base_graph.edge_weight, np.float32)
    rel_base = np.asarray(base_graph.relation_graph.edge_weight, np.float32)
    rel_pad = base_graph.relation_graph.num_edges_padded
    slot_ew = np.broadcast_to(ew_base, (s, n, len(ew_base))).copy()
    slot_rel = np.broadcast_to(rel_base, (s, n, rel_pad)).copy()
    for si, plan in enumerate(plans):
        assert len(plan.slot_weights) == s, "shards must share program length"
        for i, (w, rg) in enumerate(zip(plan.slot_weights, plan.slot_rel_graphs)):
            if w is None:
                continue
            slot_ew[i, si] = w
            assert isinstance(rg, np.ndarray), (
                "per-rank dropout requires the DropoutPlanner fast path"
            )
            slot_rel[i, si] = np.pad(rg, (0, rel_pad - len(rg)))
    return slot_ew, slot_rel


def make_query_forward(ultra_cfg: UltraConfig, qcfg: QueryConfig):
    @jax.jit
    def fwd(params, graph: Graph, kind, operand, rel_reprs_all=None):
        return execute(params, ultra_cfg, qcfg, graph, kind, operand,
                       rel_reprs_all=rel_reprs_all)

    return fwd


def make_query_forward_grouped(ultra_cfg: UltraConfig, qcfg: QueryConfig):
    """Eval forward with round-grouped projections: GNN calls per batch =
    max projections per query (3 on BetaE mixes) instead of one per
    program slot (~L-1 on mixed-type batches) — the reference's deferred
    scheduler (ultraquery.py:109-133) for a fixed-shape executor. The jit
    cache is keyed by n_rounds, bucketed via pad_round_schedule."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n_rounds",))
    def fwd_jit(params, graph: Graph, kind, operand, round_of, has_proj,
                arg_slot, n_rounds, rel_reprs_all=None):
        return execute_grouped(
            params, ultra_cfg, qcfg, graph, kind, operand,
            round_of, has_proj, arg_slot, n_rounds, rel_reprs_all=rel_reprs_all,
        )

    def fwd(params, graph: Graph, kind, operand, rel_reprs_all=None):
        round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
        has_proj, arg_slot, n_rounds, _ = pad_round_schedule(
            has_proj, arg_slot, n_rounds
        )
        # NO eval stream budget here, on purpose: unslicing LOSES at the
        # CLQA projection shape — mixed-14 batch on chip: unsliced F=896
        # 314 ms vs training-gate 768+128 split 267 ms (15%;
        # scripts/exp_clqa_eval_budget.py, round-5 A/B). The budget only
        # wins at the fused link-prediction scorer shape (F=1024,
        # evidence/r5/eval_decomp*.log) — it stays scoped to train/eval.py.
        return fwd_jit(
            params, graph, jnp.asarray(kind), jnp.asarray(operand),
            jnp.asarray(round_of), jnp.asarray(has_proj),
            jnp.asarray(arg_slot), n_rounds, rel_reprs_all,
        )

    return fwd


def evaluate_queries(
    params,
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    graph: Graph,
    dataset: QueryDataset,
    indices: np.ndarray,
    batch_size: int,
    metric_names: Sequence[str] = ("mrr", "hits@1", "hits@3", "hits@10", "mape"),
    restrict_nodes: Optional[np.ndarray] = None,
    distributed: Optional[bool] = None,
) -> Dict[str, float]:
    """Filtered CLQA evaluation (run_query.py:157-264).

    ``distributed`` (default: on when jax.process_count() > 1) shards
    ``indices`` across processes and concatenates the per-query metric
    inputs with process allgathers — the reference's multi-GPU
    ``gather_results`` (query_utils.py:238-282) rebuilt on DCN; every
    process returns the full metric dict."""
    from ultra_tpu.train.eval import precompute_relation_representations

    if distributed is None:
        distributed = jax.process_count() > 1
    if distributed and jax.process_count() > 1:
        from ultra_tpu.parallel import multihost

        indices = np.asarray(indices)[
            multihost.shard_indices(len(indices), epoch=0, shuffle=False)
        ]

    fwd = make_query_forward_grouped(ultra_cfg, qcfg.replace(dropout_ratio=0.0))
    v = graph.num_nodes
    # eval-time relation cache: one relation-GNN pass per relation instead of
    # one per projection slot per batch
    rel_reprs_all = precompute_relation_representations(params, ultra_cfg, graph)

    all_rank, all_answer_rank = [], []
    all_easy, all_hard, all_types, all_num_pred = [], [], [], []
    for start in range(0, len(indices), batch_size):
        take = indices[start : start + batch_size]
        valid = len(take)
        if valid < batch_size:
            take = np.concatenate([take, np.repeat(take[-1:], batch_size - valid)])
        kind, operand = ops.decompose(dataset.queries[take])
        pred = np.asarray(
            fwd(params, graph, jnp.asarray(kind), jnp.asarray(operand),
                rel_reprs_all)
        )[:valid]
        take = take[:valid]
        easy = answers_to_mask([dataset.easy_answers[i] for i in take], v)
        hard = answers_to_mask([dataset.hard_answers[i] for i in take], v)
        rank, answer_rank, n_easy, n_hard = qmetrics.batch_evaluate(
            pred, easy, hard, restrict_nodes
        )
        prob = 1.0 / (1.0 + np.exp(-pred))
        num_pred = (prob * (prob > 0.5)).sum(axis=-1)
        all_rank.append(rank)
        all_answer_rank.append(answer_rank)
        all_easy.append(n_easy)
        all_hard.append(n_hard)
        all_types.append(dataset.types[take])
        all_num_pred.append(num_pred)

    vectors = [
        np.concatenate(all_rank),
        np.concatenate(all_answer_rank),
        np.concatenate(all_easy),
        np.concatenate(all_hard),
        np.concatenate(all_types),
        np.concatenate(all_num_pred),
    ]
    if distributed and jax.process_count() > 1:
        from ultra_tpu.parallel import multihost

        vectors = [multihost.gather_ranks(v) for v in vectors]
    return qmetrics.evaluate(*vectors, metric_names, dataset.id2type)


def train_queries(
    cfg: dict,
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    params,
    dataset: QueryDataset,
    workdir: str,
    seed: int = 1024,
):
    """Query-answering training loop (run_query.py:53-155).

    ``cfg["train"]["data_parallel"]: true`` shards each batch's queries over
    all devices (shard_map 'data' axis; the reference's DDP wrap of the
    query trainer, run_query.py:71-74). The traversal-dropout plan is
    per-batch and replicated, so numerics equal the single-device loop;
    batch_size must divide the device count."""
    train_cfg, task_cfg = cfg["train"], cfg["task"]
    num_epoch = int(train_cfg.get("num_epoch", 0))
    if num_epoch == 0:
        return params
    batch_size = int(train_cfg.get("batch_size", 8))
    batch_per_epoch = train_cfg.get("batch_per_epoch") or None
    adv_temp = float(task_cfg.get("adversarial_temperature", 0.2))
    fast_test = train_cfg.get("fast_test")

    from ultra_tpu.models.nbfnet import sum_only_aggregators

    sort_v2 = sum_only_aggregators(ultra_cfg)
    qg_train = dataset.graphs[0]
    base_graph = prepare_query_graph(qg_train, v2_sort_slots=sort_v2)
    rel_pad = base_graph.relation_graph.num_edges_padded
    graph_host = {
        "edge_index": qg_train.edge_index,
        "edge_type": qg_train.edge_type,
        "num_nodes": qg_train.num_nodes,
        "num_relations": qg_train.num_relations,
        "e_pad": base_graph.num_edges_padded,
        "inverse_rel_plus_one": qg_train.inverse_rel_plus_one,
    }
    valid_graph = prepare_query_graph(dataset.graphs[1], v2_sort_slots=sort_v2)
    # fast dropout path: per-round relation-graph edits become weight masks
    # over base_graph.relation_graph (one shared Pallas plan / jit trace)
    planner = DropoutPlanner(graph_host)

    optimizer = make_optimizer(lr=float(cfg["optimizer"].get("lr", 5e-4)))
    state = init_train_state(params, optimizer)
    # supervisor resume contract (same as train/runner.py and
    # train/pretrain.py): model_latest saved each epoch; supervise.py
    # relaunches with ULTRA_RESUME_FROM after a crash/outage
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
        logger.warning("resumed query train state from %s", resume_from)
    # reference-DDP compat: per data shard traversal dropout (rank-coupled
    # rngs, run.py:234) instead of the default replicated per-batch masks
    per_rank = bool(task_cfg.get("per_rank_traversal_dropout", False))
    grouped = False
    n_dev = jax.device_count()
    if bool(train_cfg.get("data_parallel", False)):
        from jax.sharding import Mesh

        assert batch_size % n_dev == 0, (batch_size, n_dev)
        mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))
        if per_rank:
            step_fn = make_per_rank_query_train_step(
                ultra_cfg, qcfg, optimizer, mesh, adv_temp
            )(base_graph)
            step_factory = None
        elif bool(train_cfg.get("grouped_projections", False)):
            step_fn = make_sharded_grouped_query_train_step(
                ultra_cfg, qcfg, optimizer, mesh, adv_temp
            )
            step_factory = None
            grouped = True
        else:
            step_factory = make_sharded_query_train_step(
                ultra_cfg, qcfg, optimizer, mesh, adv_temp
            )
            step_fn = None  # built lazily from the first batch's slot structure
    else:
        assert not per_rank, "per_rank_traversal_dropout requires data_parallel"
        step_factory = None
        if bool(train_cfg.get("grouped_projections", False)):
            # reference-scheduler projection grouping: GNN rounds = max
            # projections per query, one dropout mask per round
            step_fn = make_grouped_query_train_step(
                ultra_cfg, qcfg, optimizer, adv_temp,
                grad_accum=int(train_cfg.get("grad_accum", 1)),
            )
            grouped = True
        else:
            step_fn = make_query_train_step(ultra_cfg, qcfg, optimizer, adv_temp)
            grouped = False

    (tr_lo, tr_hi), (va_lo, va_hi), _ = dataset.split_ranges()
    train_idx = np.arange(tr_lo, tr_hi)
    valid_idx = np.arange(va_lo, va_hi)
    rng = np.random.default_rng(seed)
    # rank-coupled streams for per-rank dropout (run.py:234 seeding pattern)
    rank_rngs = [np.random.default_rng(seed + s) for s in range(n_dev)]
    tracker = ckpt_lib.BestModelTracker(workdir)
    steps_per_epoch = batch_per_epoch or math.ceil(len(train_idx) / batch_size)
    epoch_block = math.ceil(num_epoch / 10)
    v = base_graph.num_nodes

    epoch = 0
    for block_start in range(0, num_epoch, epoch_block):
        for epoch in range(block_start, min(num_epoch, block_start + epoch_block)):
            t0 = time.time()
            losses = []
            perm = rng.permutation(train_idx)
            for step in range(steps_per_epoch):
                take = perm[(step * batch_size) % len(perm) :][:batch_size]
                while len(take) < batch_size:  # wrap (tiny datasets: repeat)
                    take = np.concatenate([take, perm[: batch_size - len(take)]])
                kind, operand = ops.decompose(dataset.queries[take])
                target = answers_to_mask(
                    [dataset.easy_answers[i] for i in take], v
                ).astype(np.float32)
                if grouped:
                    round_of, has_proj, arg_slot, n_rounds = (
                        projection_schedule(kind)
                    )
                    plan = simulate_symbolic_grouped(
                        kind, operand, round_of, has_proj, arg_slot, n_rounds,
                        graph_host, qcfg, rng, planner,
                    )
                    round_graphs = graphs_for_slots(base_graph, plan)
                    state, loss = step_fn(
                        state, round_graphs, kind, operand, target
                    )
                    losses.append(loss)
                    continue
                if per_rank:
                    shards = np.array_split(np.arange(batch_size), n_dev)
                    plans = [
                        simulate_symbolic(
                            kind[rs], operand[rs], graph_host, qcfg,
                            rank_rngs[s], rel_pad_to=rel_pad,
                            training=True, planner=planner,
                        )
                        for s, rs in enumerate(shards)
                    ]
                    slot_ew, slot_rel = per_rank_slot_weights(base_graph, plans)
                    state, loss = step_fn(
                        state, base_graph, jnp.asarray(slot_ew),
                        jnp.asarray(slot_rel), jnp.asarray(kind),
                        jnp.asarray(operand), jnp.asarray(target),
                    )
                    losses.append(loss)
                    continue
                plan = simulate_symbolic(
                    kind, operand, graph_host, qcfg, rng, rel_pad_to=rel_pad,
                    training=True, planner=planner,
                )
                slot_graphs = graphs_for_slots(base_graph, plan)
                if step_fn is None:
                    step_fn = step_factory(slot_graphs)
                state, loss = step_fn(
                    state, slot_graphs, jnp.asarray(kind), jnp.asarray(operand),
                    jnp.asarray(target),
                )
                losses.append(loss)
            logger.warning(
                "epoch %d: avg bce %.6f (%.1fs)", epoch,
                float(np.mean([float(l) for l in losses])), time.time() - t0,
            )
            ckpt_lib.save_pytree(
                os.path.join(workdir, "model_latest"),
                {"params": state.params, "opt_state": state.opt_state},
            )

        idx = valid_idx
        if fast_test is not None and fast_test < len(idx):
            idx = np.random.default_rng(1024).choice(idx, size=fast_test, replace=False)
        val = evaluate_queries(
            state.params, ultra_cfg, qcfg, valid_graph, dataset, idx,
            batch_size=batch_size, metric_names=("mrr",),
            restrict_nodes=dataset.graphs[1].restrict_nodes,
        )
        logger.warning("valid after epoch %d: mrr %.4f", epoch, val["mrr"])
        tracker.update(epoch + 1, val["mrr"], state)

    return tracker.load_best(state.params)
