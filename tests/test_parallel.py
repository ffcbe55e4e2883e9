"""SPMD correctness on the virtual 8-device CPU mesh: the sharded (data x
edge) train/eval steps must agree numerically with the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig, ultra_apply, ultra_score_all
from ultra_tpu import tasks
from ultra_tpu.parallel.dp import make_sharded_score_step, make_sharded_train_step
from ultra_tpu.parallel.mesh import make_mesh
from ultra_tpu.train.loop import (
    init_train_state,
    init_ultra_params,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_cfg():
    dims = (32, 32)
    return UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=dims, num_relation=1, project_relations=True
        ),
    )


@pytest.fixture(scope="module")
def setup():
    # pad edges so they divide the edge axis (2 and 4)
    graph, ei, et = synthetic_graph(
        num_nodes=24, num_direct_rel=4, num_triples=100, seed=5, pad_edges_to=208
    )
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    cfg = small_cfg()
    params = init_ultra_params(cfg, jax.random.key(1))
    return graph, ei, et, index, cfg, params


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_score_matches_single_device(setup, mesh_shape):
    graph, ei, et, index, cfg, params = setup
    data, edge = mesh_shape
    mesh = make_mesh(data=data, edge=edge)

    rng = np.random.default_rng(0)
    b = 8
    h = rng.integers(0, graph.num_nodes, size=b)
    t = rng.integers(0, graph.num_nodes, size=b)
    r = rng.integers(0, graph.num_relations // 2, size=b)
    batch = jnp.asarray(np.stack([h, t, r], axis=1))

    score_step = make_sharded_score_step(mesh, cfg, graph)
    t_pred, h_pred = score_step(params, graph, batch)

    t_ref = ultra_score_all(params, cfg, graph, batch[:, 0], r_index=batch[:, 2])
    h_ref = ultra_score_all(
        params, cfg, graph, batch[:, 1],
        r_index=batch[:, 2] + graph.num_relations // 2, query_r_index=batch[:, 2],
    )
    np.testing.assert_allclose(np.asarray(t_pred), np.asarray(t_ref), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_pred), np.asarray(h_ref), rtol=2e-4, atol=1e-4)


def test_sharded_train_step_matches_single_device(setup):
    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=4, edge=2)
    opt = make_optimizer(lr=1e-3)

    rng = np.random.default_rng(3)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)

    sharded_step = make_sharded_train_step(mesh, cfg, opt, graph, num_negative=4)
    state_s = init_train_state(params, opt)
    state_s, loss_s = sharded_step(state_s, graph, jnp.asarray(batch), jnp.asarray(ew))

    single_step = make_train_step(cfg, opt, num_negative=4)
    state_1 = init_train_state(params, opt)
    state_1, loss_1 = single_step(state_1, graph, jnp.asarray(batch), jnp.asarray(ew))

    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-4)
    flat_s = jax.tree.leaves(state_s.params)
    flat_1 = jax.tree.leaves(state_1.params)
    for a, b in zip(flat_s, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_per_rank_easy_edges_matches_ddp_semantics(setup):
    """Reference-DDP compat mode: each data shard masks only its own rows'
    easy edges. Oracle: mean of per-shard single-device losses, each with
    its own mask (exactly what DDP gradient averaging computes)."""
    graph, ei, et, index, cfg, params = setup
    n_data = 4
    mesh = make_mesh(data=n_data, edge=2)
    opt = make_optimizer(lr=1e-3)

    rng = np.random.default_rng(9)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
    shards = np.array_split(batch, n_data)
    ew = np.stack([
        tasks.easy_edge_weights(index, rows, graph.num_edges_padded)
        for rows in shards
    ])
    assert not np.allclose(ew[0], ew[1])  # masks genuinely differ per shard

    step = make_sharded_train_step(
        mesh, cfg, opt, graph, num_negative=4, per_rank_easy_edges=True
    )
    state = init_train_state(params, opt)
    state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))

    # oracle: DDP = average of per-shard losses, each on its own masked graph
    from ultra_tpu.train.loop import self_adversarial_bce

    def ddp_loss(p):
        losses = []
        for rows, w in zip(shards, ew):
            g = graph.replace(edge_weight=jnp.asarray(w))
            pred = ultra_apply(p, cfg, g, jnp.asarray(rows))
            losses.append(self_adversarial_bce(pred, 1.0, 4))
        return jnp.mean(jnp.stack(losses))

    loss_ref, grads_ref = jax.value_and_grad(ddp_loss)(params)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    upd, _ = opt.update(grads_ref, init_train_state(params, opt).opt_state, params)
    import optax

    params_ref = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5)


def test_sharded_pallas_plans_match_single_device(setup):
    """Edge-partitioned rspmm on the PALLAS path: stacked per-shard plans
    inside shard_map must reproduce the single-device scores."""
    from ultra_tpu.ops.rspmm_pallas import build_sharded_plans

    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=4, edge=2)
    e = ei.shape[1]
    e_pad = graph.num_edges_padded
    host = (
        np.pad(ei, ((0, 0), (0, e_pad - e))),
        np.pad(et, (0, e_pad - e)),
        np.pad(np.ones(e, np.float32), (0, e_pad - e)),
    )
    graph_sp = build_sharded_plans(graph, 2, rb=16, chunk=32, host_edges=host)
    assert graph_sp.plans.num_shards == 2
    assert graph_sp.plans.dst.reduce_blk.ndim == 2  # stacked

    rng = np.random.default_rng(7)
    b = 8
    h = rng.integers(0, graph.num_nodes, size=b)
    t = rng.integers(0, graph.num_nodes, size=b)
    r = rng.integers(0, graph.num_relations // 2, size=b)
    batch = jnp.asarray(np.stack([h, t, r], axis=1))

    score_step = make_sharded_score_step(mesh, cfg, graph_sp)
    t_pred, h_pred = score_step(params, graph_sp, batch)

    t_ref = ultra_score_all(params, cfg, graph, batch[:, 0], r_index=batch[:, 2])
    np.testing.assert_allclose(np.asarray(t_pred), np.asarray(t_ref), rtol=2e-3, atol=2e-3)


def test_sharded_pallas_train_step_matches(setup):
    from ultra_tpu.ops.rspmm_pallas import build_sharded_plans

    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=4, edge=2)
    e = ei.shape[1]
    e_pad = graph.num_edges_padded
    host = (
        np.pad(ei, ((0, 0), (0, e_pad - e))),
        np.pad(et, (0, e_pad - e)),
        np.pad(np.ones(e, np.float32), (0, e_pad - e)),
    )
    graph_sp = build_sharded_plans(graph, 2, rb=16, chunk=32, host_edges=host)
    opt = make_optimizer(lr=1e-3)

    rng = np.random.default_rng(3)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)

    step = make_sharded_train_step(mesh, cfg, opt, graph_sp, num_negative=4)
    state = init_train_state(params, opt)
    state, loss_sp = step(state, graph_sp, jnp.asarray(batch), jnp.asarray(ew))

    single = make_train_step(cfg, opt, num_negative=4)
    state1 = init_train_state(params, opt)
    state1, loss_1 = single(state1, graph, jnp.asarray(batch), jnp.asarray(ew))
    np.testing.assert_allclose(float(loss_sp), float(loss_1), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=5e-5)


@pytest.mark.parametrize("agg", ["pna", "max"])
def test_sharded_pna_score_matches_single_device(setup, agg):
    """Edge-sharded scoring with min/max-bearing aggregators: per-shard
    partials combine with psum/pmax/pmin over the edge axis."""
    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=4, edge=2)
    in_mult = 13 if agg == "pna" else 2
    dims = (32, 32)
    cfg2 = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=dims, num_relation=1,
            project_relations=True, aggregate_func=agg,
        ),
    )
    from ultra_tpu.train.loop import init_ultra_params as init_p

    params2 = init_p(cfg2, jax.random.key(2))

    rng = np.random.default_rng(1)
    b = 8
    h = rng.integers(0, graph.num_nodes, size=b)
    t = rng.integers(0, graph.num_nodes, size=b)
    r = rng.integers(0, graph.num_relations // 2, size=b)
    batch = jnp.asarray(np.stack([h, t, r], axis=1))

    score_step = make_sharded_score_step(mesh, cfg2, graph)
    t_pred, h_pred = score_step(params2, graph, batch)
    t_ref = ultra_score_all(params2, cfg2, graph, batch[:, 0], r_index=batch[:, 2])
    np.testing.assert_allclose(np.asarray(t_pred), np.asarray(t_ref),
                               rtol=2e-3, atol=2e-3)


def test_sharded_pna_train_step_matches(setup):
    """Edge-sharded TRAINING with PNA aggregation: routed min/max gradient
    kernels run per shard inside shard_map, partial grads psum over the
    mesh — must equal the single-device step."""
    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=2, edge=4)
    dims = (32, 32)
    cfg2 = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=dims, num_relation=1,
            project_relations=True, aggregate_func="pna",
        ),
    )
    from ultra_tpu.train.loop import init_ultra_params as init_p

    params2 = init_p(cfg2, jax.random.key(4))
    opt = make_optimizer(lr=1e-3)

    rng = np.random.default_rng(5)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)

    step = make_sharded_train_step(mesh, cfg2, opt, graph, num_negative=4)
    state = init_train_state(params2, opt)
    state, loss_sp = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))

    single = make_train_step(cfg2, opt, num_negative=4)
    state1 = init_train_state(params2, opt)
    state1, loss_1 = single(state1, graph, jnp.asarray(batch), jnp.asarray(ew))
    np.testing.assert_allclose(float(loss_sp), float(loss_1), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=5e-5)


def test_sharded_grad_accum_matches_full_batch(setup):
    """grad_accum micro-stepping on the sharded step == the full-batch
    sharded step (each micro-batch still shards over 'data')."""
    graph, ei, et, index, cfg, params = setup
    mesh = make_mesh(data=2, edge=4)
    opt = make_optimizer(lr=1e-3)

    rng = np.random.default_rng(8)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch, ew = jnp.asarray(batch), jnp.asarray(ew)

    step1 = make_sharded_train_step(mesh, cfg, opt, graph, num_negative=4)
    s1, l1 = step1(init_train_state(params, opt), graph, batch, ew)
    step2 = make_sharded_train_step(mesh, cfg, opt, graph, num_negative=4,
                                    grad_accum=2)
    s2, l2 = step2(init_train_state(params, opt), graph, batch, ew)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
