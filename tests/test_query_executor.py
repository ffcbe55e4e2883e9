"""UltraQuery executor tests: the slot-synchronous device interpreter must
match a faithful reimplementation of the reference's host-side while-loop
scheduler (deferred projections, per-sample instruction pointers) using the
same relation-projection model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.query import ops
from ultra_tpu.query.executor import (
    QueryConfig,
    conjunction,
    disjunction,
    execute,
    relation_projection,
    simulate_symbolic,
)
from ultra_tpu.train.loop import init_ultra_params

L = 8  # padded program length


def small_setup():
    graph, ei, et = synthetic_graph(num_nodes=25, num_direct_rel=4, num_triples=120, seed=11)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16, 16), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(3))
    return graph, ei, et, cfg, params


def make_queries(graph, rng):
    """A mixed-type batch: 1p, 2p, 2i, 2u, 3in-ish with negation."""
    v, r = graph.num_nodes, graph.num_relations
    e = lambda: int(rng.integers(0, v))
    rel = lambda: int(rng.integers(0, r))
    qs = [
        np.array([e(), ops.PROJECTION | rel(), ops.STOP], dtype=np.int64),  # 1p
        np.array(
            [e(), ops.PROJECTION | rel(), ops.PROJECTION | rel(), ops.STOP], dtype=np.int64
        ),  # 2p
        np.array(
            [e(), ops.PROJECTION | rel(), e(), ops.PROJECTION | rel(),
             ops.INTERSECTION | 2, ops.STOP], dtype=np.int64,
        ),  # 2i
        np.array(
            [e(), ops.PROJECTION | rel(), e(), ops.PROJECTION | rel(),
             ops.UNION | 2, ops.STOP], dtype=np.int64,
        ),  # 2u
        np.array(
            [e(), ops.PROJECTION | rel(), ops.NEGATION, e(), ops.PROJECTION | rel(),
             ops.INTERSECTION | 2, ops.STOP], dtype=np.int64,
        ),  # 2in
    ]
    return ops.pad_queries(qs, L)


def reference_style_execute(params, cfg, qcfg, graph, query):
    """Faithful numpy/jnp port of the reference while-loop executor
    (ultraquery.py:85-136): eager cheap ops, deferred batched projections."""
    b = query.shape[0]
    v = graph.num_nodes
    stack = np.zeros((b, 2, v), dtype=np.float64)
    sp = np.zeros(b, dtype=np.int64)
    ip = np.zeros(b, dtype=np.int64)

    def push(mask, val):
        stack[mask, sp[mask]] = val[mask]
        sp[mask] += 1

    def pop(mask):
        sp[mask] -= 1
        return stack[np.arange(b), np.clip(sp, 0, 1)]

    q = np.asarray(query)
    while True:
        op = q[np.arange(b), ip]
        is_stop = (op & ops.STOP) > 0
        if is_stop.all():
            break
        is_operand = (op & ops.OPERATION) == 0
        is_inter = (op & ops.INTERSECTION) > 0
        is_union = (op & ops.UNION) > 0
        is_neg = (op & ops.NEGATION) > 0
        is_proj = (op & ops.PROJECTION) > 0
        if is_operand.any():
            onehot = np.zeros((b, v))
            onehot[np.arange(b), op & ~ops.OPERATION] = 1.0
            push(is_operand, onehot)
            ip[is_operand] += 1
        if is_inter.any():
            y = pop(is_inter); x = pop(is_inter)
            push(is_inter, np.asarray(conjunction(qcfg.logic, jnp.asarray(x), jnp.asarray(y))))
            ip[is_inter] += 1
        if is_union.any():
            y = pop(is_union); x = pop(is_union)
            push(is_union, np.asarray(disjunction(qcfg.logic, jnp.asarray(x), jnp.asarray(y))))
            ip[is_union] += 1
        if is_neg.any():
            x = pop(is_neg)
            push(is_neg, 1.0 - x)
            ip[is_neg] += 1
        if not (is_operand | is_inter | is_union | is_neg).any() and is_proj.any():
            h = pop(is_proj)
            r_index = np.where(is_proj, (op & ~ops.OPERATION), 0)
            t_prob = relation_projection(
                params, cfg, qcfg, graph,
                jnp.asarray(h.astype(np.float32)), jnp.asarray(r_index.astype(np.int32)),
            )
            push(is_proj, np.asarray(t_prob, dtype=np.float64))
            ip[is_proj] += 1

    t_prob = pop(np.ones(b, bool))
    return np.log((t_prob + 1e-10) / (1 - t_prob + 1e-10))


@pytest.mark.parametrize("logic", ["product", "godel", "lukasiewicz"])
def test_executor_matches_reference_scheduler(logic):
    graph, ei, et, cfg, params = small_setup()
    rng = np.random.default_rng(0)
    query = make_queries(graph, rng)
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(logic=logic, dropout_ratio=0.0)

    got = execute(
        params, cfg, qcfg, graph, jnp.asarray(kind), jnp.asarray(operand)
    )
    expect = reference_style_execute(params, cfg, qcfg, graph, query)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("logic", ["product", "godel", "lukasiewicz"])
def test_grouped_executor_matches_slot_synchronous(logic):
    """execute_grouped (projections batched by round) must equal both the
    slot-synchronous executor and the reference-style scheduler on a mixed
    batch, with exactly max-projections-per-query GNN rounds."""
    from ultra_tpu.query.executor import execute_grouped, projection_schedule

    graph, ei, et, cfg, params = small_setup()
    rng = np.random.default_rng(5)
    query = make_queries(graph, rng)
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(logic=logic, dropout_ratio=0.0)

    round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
    assert n_rounds == 2  # deepest query in the mix is 2p / 2in

    got = execute_grouped(
        params, cfg, qcfg, graph, jnp.asarray(kind), jnp.asarray(operand),
        jnp.asarray(round_of), jnp.asarray(has_proj), jnp.asarray(arg_slot),
        n_rounds,
    )
    slot_sync = execute(
        params, cfg, qcfg, graph, jnp.asarray(kind), jnp.asarray(operand)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(slot_sync), rtol=1e-5, atol=1e-6
    )
    expect = reference_style_execute(params, cfg, qcfg, graph, query)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-3, atol=1e-4)


def test_grouped_forward_wrapper():
    """make_query_forward_grouped handles schedule plumbing + jit caching."""
    from ultra_tpu.query.trainer import make_query_forward, make_query_forward_grouped

    graph, ei, et, cfg, params = small_setup()
    rng = np.random.default_rng(7)
    query = make_queries(graph, rng)
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(dropout_ratio=0.0)

    plain = make_query_forward(cfg, qcfg)(
        params, graph, jnp.asarray(kind), jnp.asarray(operand)
    )
    grouped = make_query_forward_grouped(cfg, qcfg)(params, graph, kind, operand)
    np.testing.assert_allclose(
        np.asarray(grouped), np.asarray(plain), rtol=1e-5, atol=1e-6
    )


def test_round_bucket_padding_is_numeric_noop():
    """pad_round_schedule pads deep chains to the next ROUND_BUCKET; pad
    rounds (has_proj all-False GNN calls) must not change outputs. A 5-hop
    chain buckets to 6 rounds."""
    from ultra_tpu.query.executor import (
        bucket_rounds, execute_grouped, pad_round_schedule, projection_schedule,
    )

    graph, ei, et, cfg, params = small_setup()
    rng = np.random.default_rng(9)
    v, r = graph.num_nodes, graph.num_relations
    q5 = np.array(
        [int(rng.integers(0, v))]
        + [ops.PROJECTION | int(rng.integers(0, r)) for _ in range(5)]
        + [ops.STOP],
        dtype=np.int64,
    )
    kind, operand = ops.decompose(ops.pad_queries([q5, q5], L))
    qcfg = QueryConfig(dropout_ratio=0.0)

    round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
    assert n_rounds == 5 and bucket_rounds(5) == 6
    raw = execute_grouped(
        params, cfg, qcfg, graph, jnp.asarray(kind), jnp.asarray(operand),
        jnp.asarray(round_of), jnp.asarray(has_proj), jnp.asarray(arg_slot),
        n_rounds,
    )
    has_p, arg_p, n_b, graphs_p = pad_round_schedule(
        has_proj, arg_slot, n_rounds, [graph] * n_rounds
    )
    assert n_b == 6 and len(graphs_p) == 6
    padded = execute_grouped(
        params, cfg, qcfg, graphs_p, jnp.asarray(kind), jnp.asarray(operand),
        jnp.asarray(round_of), jnp.asarray(has_p), jnp.asarray(arg_p), n_b,
    )
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(raw), rtol=1e-6, atol=1e-7
    )
    # gradients must also be untouched by pad rounds
    def loss(p, n, hp, asl, gs):
        out = execute_grouped(
            p, cfg, qcfg, gs, jnp.asarray(kind), jnp.asarray(operand),
            jnp.asarray(round_of), jnp.asarray(hp), jnp.asarray(asl), n,
        )
        return jnp.sum(out ** 2)

    g_raw = jax.grad(loss)(params, n_rounds, has_proj, arg_slot, [graph] * n_rounds)
    g_pad = jax.grad(loss)(params, n_b, has_p, arg_p, graphs_p)
    for a, b in zip(jax.tree.leaves(g_raw), jax.tree.leaves(g_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_executor_jits():
    graph, ei, et, cfg, params = small_setup()
    rng = np.random.default_rng(1)
    query = make_queries(graph, rng)
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(dropout_ratio=0.0)

    f = jax.jit(
        lambda p, g, k, o: execute(p, cfg, qcfg, g, k, o)
    )
    out = f(params, graph, jnp.asarray(kind), jnp.asarray(operand))
    assert np.isfinite(np.asarray(out)).all()


def test_symbolic_simulation_traversal():
    """Symbolic machine: 1p query answers == exact graph traversal."""
    graph, ei, et, cfg, params = small_setup()
    h = int(ei[0, 0])
    r = int(et[0])
    query = ops.pad_queries(
        [np.array([h, ops.PROJECTION | r, ops.STOP], dtype=np.int64)], L
    )
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(dropout_ratio=0.0)
    host = {
        "edge_index": ei, "edge_type": et,
        "num_nodes": graph.num_nodes, "num_relations": graph.num_relations,
        "e_pad": graph.num_edges_padded,
    }
    plan = simulate_symbolic(kind, operand, host, qcfg, np.random.default_rng(0), training=False)
    # the projection slot produced full-live weights + a relation graph
    proj_slots = [i for i, w in enumerate(plan.slot_weights) if w is not None]
    assert proj_slots == [1]
    w = plan.slot_weights[1]
    assert w[: ei.shape[1]].all()  # no dropout at eval

    # final symbolic state must equal the true tail set
    expected = set(ei[1, (ei[0] == h) & (et == r)])
    # re-simulate manually to read the final stack: use training=False + sets
    from ultra_tpu.query.executor import symbolic_traversal_host

    h_sets = np.zeros((1, graph.num_nodes), bool)
    h_sets[0, h] = True
    out = symbolic_traversal_host(
        h_sets, np.array([r]), ei, et, np.ones(ei.shape[1], bool)
    )
    assert set(np.nonzero(out[0])[0]) == expected


def test_traversal_dropout_masks_direct_edges():
    graph, ei, et, cfg, params = small_setup()
    h = int(ei[0, 0])
    r = int(et[0])
    query = ops.pad_queries(
        [np.array([h, ops.PROJECTION | r, ops.STOP], dtype=np.int64)], L
    )
    kind, operand = ops.decompose(query)
    qcfg = QueryConfig(dropout_ratio=1.0)  # drop every droppable traversed edge
    host = {
        "edge_index": ei, "edge_type": et,
        "num_nodes": graph.num_nodes, "num_relations": graph.num_relations,
        "e_pad": graph.num_edges_padded,
    }
    plan = simulate_symbolic(kind, operand, host, qcfg, np.random.default_rng(0), training=True)
    w = plan.slot_weights[1][: ei.shape[1]]
    # all direct (h, r, *) edges with safe degrees are dropped
    direct = (ei[0] == h) & (et == r)
    deg_h = np.bincount(ei[0], minlength=graph.num_nodes)
    deg_t = np.bincount(ei[1], minlength=graph.num_nodes)
    droppable = direct & (deg_h[ei[0]] > 1) & (deg_t[ei[1]] > 1)
    assert not w[droppable].any()
    # and the rebuilt relation graph exists for that slot
    assert plan.slot_rel_graphs[1] is not None
