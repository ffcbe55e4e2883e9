"""Fast traversal-dropout path: the DropoutPlanner's incremental
relation-graph weight masks must be exactly equivalent to the full per-round
rebuild (ultraquery.py:199-203) — same surviving relation edge set, same
executor outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu import tasks
from ultra_tpu.data.synthetic import random_kg_triples, synthetic_graph, with_inverses
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.query import ops
from ultra_tpu.query.executor import (
    DropoutPlanner,
    QueryConfig,
    execute,
    graphs_for_slots,
    simulate_symbolic,
)
from ultra_tpu.train.loop import init_ultra_params

L = 8


def edge_set(ei, et):
    return set(zip(ei[0].tolist(), ei[1].tolist(), et.tolist()))


@pytest.mark.parametrize("seed,shape", [(0, (40, 6, 150)), (1, (200, 12, 1200))])
def test_relgraph_masker_matches_rebuild(seed, shape):
    v, rr, t = shape
    trip = random_kg_triples(v, rr, t, seed=seed)
    ei, et = with_inverses(trip, rr)
    r = 2 * rr
    e = ei.shape[1]
    base_ei, base_et = tasks.build_relation_graph_arrays(ei, et, v, r)
    masker = tasks.RelGraphMasker(ei, et, v, r, base_ei, base_et)
    rng = np.random.default_rng(seed + 100)
    for ratio in (0.0, 0.05, 0.3, 0.7):
        drop = np.nonzero(rng.random(e) < ratio)[0]
        live = np.ones(e, bool)
        live[drop] = False
        ref_ei, ref_et = tasks.build_relation_graph_arrays(ei, et, v, r, live=live)
        w = masker.edge_weights(drop)
        got = edge_set(
            np.stack([base_ei[0][w > 0], base_ei[1][w > 0]]), base_et[w > 0]
        )
        assert got == edge_set(ref_ei, ref_et)


def test_masker_recomputes_rel_arrays_deterministically():
    trip = random_kg_triples(30, 4, 90, seed=5)
    ei, et = with_inverses(trip, 4)
    explicit_ei, explicit_et = tasks.build_relation_graph_arrays(ei, et, 30, 8)
    m1 = tasks.RelGraphMasker(ei, et, 30, 8)  # recomputes internally
    assert (m1.rel_src == explicit_ei[0]).all()
    assert (m1.rel_dst == explicit_ei[1]).all()
    assert (m1.rel_type == explicit_et).all()


def _query_setup():
    graph, ei, et = synthetic_graph(
        num_nodes=25, num_direct_rel=4, num_triples=120, seed=11
    )
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16, 16), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(3))
    host = {
        "edge_index": ei,
        "edge_type": et,
        "num_nodes": graph.num_nodes,
        "num_relations": graph.num_relations,
        "e_pad": graph.num_edges_padded,
    }
    rng = np.random.default_rng(7)
    v, r = graph.num_nodes, graph.num_relations
    qs = [
        np.array(
            [3, ops.PROJECTION | 1, ops.PROJECTION | 2, ops.STOP], dtype=np.int64
        ),
        np.array(
            [5, ops.PROJECTION | 0, 9, ops.PROJECTION | 3, ops.INTERSECTION | 2,
             ops.STOP],
            dtype=np.int64,
        ),
        np.array(
            [2, ops.PROJECTION | 5, ops.NEGATION, 4, ops.PROJECTION | 6,
             ops.UNION | 2, ops.STOP],
            dtype=np.int64,
        ),
    ]
    kind, operand = ops.decompose(ops.pad_queries(qs, L))
    return graph, host, cfg, params, kind, operand


def test_fast_path_matches_slow_path():
    graph, host, cfg, params, kind, operand = _query_setup()
    qcfg = QueryConfig(dropout_ratio=0.5)
    rel_pad = graph.relation_graph.num_edges_padded

    plan_slow = simulate_symbolic(
        kind, operand, host, qcfg, np.random.default_rng(42), rel_pad_to=rel_pad,
        training=True,
    )
    planner = DropoutPlanner(host)
    plan_fast = simulate_symbolic(
        kind, operand, host, qcfg, np.random.default_rng(42), training=True,
        planner=planner,
    )

    for ws, wf in zip(plan_slow.slot_weights, plan_fast.slot_weights):
        assert (ws is None) == (wf is None)
        if ws is not None:
            np.testing.assert_array_equal(ws, wf)

    # surviving relation edge sets agree slot by slot
    for rg_slow, w_rel in zip(plan_slow.slot_rel_graphs, plan_fast.slot_rel_graphs):
        if rg_slow is None:
            assert w_rel is None
            continue
        assert isinstance(w_rel, np.ndarray)
        base_m = planner.masker
        got = edge_set(
            np.stack([base_m.rel_src[w_rel > 0], base_m.rel_dst[w_rel > 0]]),
            base_m.rel_type[w_rel > 0],
        )
        live_slow = np.asarray(rg_slow.edge_weight) > 0
        sei = np.asarray(rg_slow.edge_index)
        want = edge_set(sei[:, live_slow], np.asarray(rg_slow.edge_type)[live_slow])
        assert got == want

    # identical executor outputs end-to-end
    out_slow = execute(
        params, cfg, qcfg, graphs_for_slots(graph, plan_slow), jnp.asarray(kind),
        jnp.asarray(operand),
    )
    out_fast = execute(
        params, cfg, qcfg, graphs_for_slots(graph, plan_fast), jnp.asarray(kind),
        jnp.asarray(operand),
    )
    np.testing.assert_allclose(
        np.asarray(out_slow), np.asarray(out_fast), rtol=1e-5, atol=1e-5
    )


def test_sharded_query_train_step_matches_single_device():
    """DP UltraQuery training (shard_map over 'data') == single-device step
    on the same global batch + dropout plan."""
    from jax.sharding import Mesh

    from ultra_tpu.query.trainer import (
        make_query_train_step,
        make_sharded_query_train_step,
    )
    from ultra_tpu.train.loop import init_train_state, make_optimizer

    graph, host, cfg, params, kind, operand = _query_setup()
    # pad batch to 8 rows for the 8-device data axis
    reps = 8 // kind.shape[0] + 1
    kind = np.concatenate([kind] * reps)[:8]
    operand = np.concatenate([operand] * reps)[:8]
    qcfg = QueryConfig(dropout_ratio=0.5)
    planner = DropoutPlanner(host)
    plan = simulate_symbolic(
        kind, operand, host, qcfg, np.random.default_rng(3), training=True,
        planner=planner,
    )
    slot_graphs = graphs_for_slots(graph, plan)
    rng = np.random.default_rng(0)
    target = (rng.random((8, graph.num_nodes)) < 0.05).astype(np.float32)

    opt = make_optimizer(lr=1e-3)
    kj, oj, tj = jnp.asarray(kind), jnp.asarray(operand), jnp.asarray(target)

    state1 = init_train_state(params, opt)
    step1 = make_query_train_step(cfg, qcfg, opt, adversarial_temperature=1.0)
    state1, loss1 = step1(state1, slot_graphs, kj, oj, tj)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    make = make_sharded_query_train_step(cfg, qcfg, opt, mesh,
                                         adversarial_temperature=1.0)
    step8 = make(slot_graphs)
    state8 = init_train_state(params, opt)
    state8, loss8 = step8(state8, slot_graphs, kj, oj, tj)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state8.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_per_rank_traversal_dropout_matches_ddp_oracle():
    """Reference-DDP compat: each data shard applies its own dropout plan.
    Oracle = grads of the mean of per-shard losses, each computed on that
    shard's masked graphs (what DDP gradient averaging does)."""
    import optax
    from jax.sharding import Mesh

    from ultra_tpu.query.trainer import (
        make_per_rank_query_train_step,
        per_rank_slot_weights,
        query_bce_loss,
    )
    from ultra_tpu.train.loop import init_train_state, make_optimizer

    graph, host, cfg, params, kind, operand = _query_setup()
    reps = 8 // kind.shape[0] + 1
    kind = np.concatenate([kind] * reps)[:8]
    operand = np.concatenate([operand] * reps)[:8]
    qcfg = QueryConfig(dropout_ratio=0.5)
    planner = DropoutPlanner(host)

    n_dev = 8
    shards = np.array_split(np.arange(8), n_dev)
    plans = [
        simulate_symbolic(
            kind[rs], operand[rs], host, qcfg, np.random.default_rng(100 + s),
            training=True, planner=planner,
        )
        for s, rs in enumerate(shards)
    ]
    slot_ew, slot_rel = per_rank_slot_weights(graph, plans)
    # shards drew different dropout masks (else the test shows nothing)
    assert any(
        not np.array_equal(slot_ew[i, 0], slot_ew[i, 1])
        for i in range(slot_ew.shape[0])
    )

    rng = np.random.default_rng(0)
    target = (rng.random((8, graph.num_nodes)) < 0.05).astype(np.float32)
    opt = make_optimizer(lr=1e-3)
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))
    step = make_per_rank_query_train_step(cfg, qcfg, opt, mesh,
                                          adversarial_temperature=1.0)(graph)
    state = init_train_state(params, opt)
    state, loss = step(
        state, graph, jnp.asarray(slot_ew), jnp.asarray(slot_rel),
        jnp.asarray(kind), jnp.asarray(operand), jnp.asarray(target),
    )

    def ddp_loss(p):
        losses = []
        for s, rs in enumerate(shards):
            slot_graphs = []
            for i in range(slot_ew.shape[0]):
                rg = graph.relation_graph.replace(
                    edge_weight=jnp.asarray(slot_rel[i, s])
                )
                slot_graphs.append(graph.replace(
                    edge_weight=jnp.asarray(slot_ew[i, s]), relation_graph=rg
                ))
            pred = execute(
                p, cfg, qcfg, slot_graphs,
                jnp.asarray(kind[rs]), jnp.asarray(operand[rs]),
            )
            losses.append(query_bce_loss(pred, jnp.asarray(target[rs]), 1.0))
        return jnp.mean(jnp.stack(losses))

    loss_ref, grads_ref = jax.value_and_grad(ddp_loss)(params)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    upd, _ = opt.update(grads_ref, init_train_state(params, opt).opt_state, params)
    params_ref = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_grouped_training_matches_slot_synchronous_with_round_graphs():
    """execute_grouped with per-round dropout graphs must equal the
    slot-synchronous executor fed slot graphs mapped slot -> its round's
    graph (same masks, same op order)."""
    from ultra_tpu.query.executor import (
        execute_grouped,
        projection_schedule,
        simulate_symbolic_grouped,
    )

    graph, host, cfg, params, kind, operand = _query_setup()
    qcfg = QueryConfig(dropout_ratio=0.5)
    planner = DropoutPlanner(host)
    round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
    assert n_rounds == 2

    plan = simulate_symbolic_grouped(
        kind, operand, round_of, has_proj, arg_slot, n_rounds,
        host, qcfg, np.random.default_rng(4), planner,
    )
    assert len(plan.slot_weights) == n_rounds
    # dropout genuinely fired in at least one round
    assert any((w < 1).any() for w in plan.slot_weights if w is not None)
    round_graphs = graphs_for_slots(graph, plan)

    got = execute_grouped(
        params, cfg, qcfg, round_graphs, jnp.asarray(kind),
        jnp.asarray(operand), jnp.asarray(round_of), jnp.asarray(has_proj),
        jnp.asarray(arg_slot), n_rounds,
    )

    # slot-synchronous oracle: every projection slot uses its round's graph
    is_proj = np.asarray(kind) == ops.K_PROJECTION
    slot_graphs = []
    for i in range(kind.shape[1]):
        rounds_here = round_of[:, i][is_proj[:, i]]
        slot_graphs.append(
            round_graphs[int(rounds_here[0])] if len(rounds_here) else graph
        )
    expect = execute(
        params, cfg, qcfg, slot_graphs, jnp.asarray(kind), jnp.asarray(operand)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6
    )


def test_grouped_training_step_decreases_loss():
    """make_grouped_query_train_step runs end-to-end and learns."""
    from ultra_tpu.query.executor import projection_schedule, simulate_symbolic_grouped
    from ultra_tpu.query.trainer import make_grouped_query_train_step
    from ultra_tpu.train.loop import init_train_state, make_optimizer

    graph, host, cfg, params, kind, operand = _query_setup()
    qcfg = QueryConfig(dropout_ratio=0.25)
    planner = DropoutPlanner(host)
    rng = np.random.default_rng(0)
    target = (rng.random((kind.shape[0], graph.num_nodes)) < 0.05).astype(np.float32)

    opt = make_optimizer(lr=5e-3)
    state = init_train_state(params, opt)
    step = make_grouped_query_train_step(cfg, qcfg, opt, adversarial_temperature=1.0)

    losses = []
    for _ in range(4):
        round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
        plan = simulate_symbolic_grouped(
            kind, operand, round_of, has_proj, arg_slot, n_rounds,
            host, qcfg, rng, planner,
        )
        round_graphs = graphs_for_slots(graph, plan)
        state, loss = step(state, round_graphs, kind, operand, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_grouped_step_matches_single_device():
    """DP grouped CLQA training == the single-device grouped step on the
    same global batch and per-round dropout plan."""
    from jax.sharding import Mesh

    from ultra_tpu.query.executor import projection_schedule, simulate_symbolic_grouped
    from ultra_tpu.query.trainer import (
        make_grouped_query_train_step,
        make_sharded_grouped_query_train_step,
    )
    from ultra_tpu.train.loop import init_train_state, make_optimizer

    graph, host, cfg, params, kind, operand = _query_setup()
    reps = 8 // kind.shape[0] + 1
    kind = np.concatenate([kind] * reps)[:8]
    operand = np.concatenate([operand] * reps)[:8]
    qcfg = QueryConfig(dropout_ratio=0.5)
    planner = DropoutPlanner(host)
    round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
    plan = simulate_symbolic_grouped(
        kind, operand, round_of, has_proj, arg_slot, n_rounds,
        host, qcfg, np.random.default_rng(11), planner,
    )
    round_graphs = graphs_for_slots(graph, plan)
    rng = np.random.default_rng(0)
    target = (rng.random((8, graph.num_nodes)) < 0.05).astype(np.float32)
    opt = make_optimizer(lr=1e-3)

    step1 = make_grouped_query_train_step(cfg, qcfg, opt, adversarial_temperature=1.0)
    state1 = init_train_state(params, opt)
    state1, loss1 = step1(state1, round_graphs, kind, operand, target)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    step8 = make_sharded_grouped_query_train_step(
        cfg, qcfg, opt, mesh, adversarial_temperature=1.0
    )
    state8 = init_train_state(params, opt)
    state8, loss8 = step8(state8, round_graphs, kind, operand, target)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state8.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_grouped_step_grad_accum_matches_full_batch():
    """grad_accum micro-batches on the grouped CLQA step == the full-batch
    step (round graphs — one dropout mask per round — are shared, and the
    loss is a mean over per-query rows)."""
    from ultra_tpu.query.executor import projection_schedule, simulate_symbolic_grouped
    from ultra_tpu.query.trainer import make_grouped_query_train_step
    from ultra_tpu.train.loop import init_train_state, make_optimizer

    graph, host, cfg, params, kind, operand = _query_setup()
    reps = 8 // kind.shape[0] + 1
    kind = np.concatenate([kind] * reps)[:8]
    operand = np.concatenate([operand] * reps)[:8]
    qcfg = QueryConfig(dropout_ratio=0.5)
    planner = DropoutPlanner(host)
    round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
    plan = simulate_symbolic_grouped(
        kind, operand, round_of, has_proj, arg_slot, n_rounds,
        host, qcfg, np.random.default_rng(11), planner,
    )
    round_graphs = graphs_for_slots(graph, plan)
    rng = np.random.default_rng(0)
    target = (rng.random((8, graph.num_nodes)) < 0.05).astype(np.float32)
    opt = make_optimizer(lr=1e-3)

    step1 = make_grouped_query_train_step(cfg, qcfg, opt, adversarial_temperature=1.0)
    state1, loss1 = step1(init_train_state(params, opt), round_graphs,
                          kind, operand, target)

    step4 = make_grouped_query_train_step(
        cfg, qcfg, opt, adversarial_temperature=1.0, grad_accum=4)
    state4, loss4 = step4(init_train_state(params, opt), round_graphs,
                          kind, operand, target)

    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state4.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)
