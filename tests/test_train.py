"""Training-loop tests: loss semantics, a few optimization steps on a
synthetic KG, easy-edge masking, and end-to-end eval metrics sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu import tasks
from ultra_tpu.train.loop import (
    init_train_state,
    init_ultra_params,
    make_optimizer,
    make_train_step,
    self_adversarial_bce,
)
from ultra_tpu.train.eval import evaluate


def small_cfg():
    dims = (32, 32)
    return UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=dims, num_relation=1, project_relations=True
        ),
    )


def test_self_adversarial_bce_matches_reference_formula():
    """Weighted BCE identical to run.py:67-77 computed by hand in numpy."""
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 6)).astype(np.float32)
    T = 0.7
    loss = np.logaddexp(0, pred) - pred * np.eye(1, 6, 0).repeat(4, 0)
    # torch BCEwithlogits(loss, target): -[t*log s + (1-t) log(1-s)]
    target = np.zeros_like(pred)
    target[:, 0] = 1
    bce = np.logaddexp(0, pred) - pred * target
    e = np.exp(pred[:, 1:] / T - pred[:, 1:].max(axis=1, keepdims=True) / T)
    w_neg = e / e.sum(axis=1, keepdims=True)
    weight = np.concatenate([np.ones((4, 1)), w_neg], axis=1)
    expect = ((bce * weight).sum(1) / weight.sum(1)).mean()

    got = self_adversarial_bce(jnp.asarray(pred), T, 5)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


@pytest.fixture(scope="module")
def training_setup():
    graph, ei, et = synthetic_graph(num_nodes=30, num_direct_rel=5, num_triples=120, seed=7)
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    cfg = small_cfg()
    params = init_ultra_params(cfg, jax.random.key(0))
    return graph, ei, et, index, cfg, params


def test_train_loss_decreases(training_setup):
    graph, ei, et, index, cfg, params = training_setup
    opt = make_optimizer(lr=1e-2)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, adversarial_temperature=1.0, num_negative=4)

    # positives = direct edges only (target split)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(8):
        batch_triples = triples[rng.choice(len(triples), size=8, replace=False)]
        batch = tasks.negative_sampling(index, batch_triples, num_negative=4, rng=rng)
        ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
        state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0], losses


def test_easy_edge_weights(training_setup):
    graph, ei, et, index, cfg, params = training_setup
    n_direct = ei.shape[1] // 2
    batch = np.array([[ei[0, 0], ei[1, 0], et[0]]])
    w = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    # the edge itself and its inverse must be zeroed
    assert w[0] == 0.0
    assert w[n_direct] == 0.0  # inverse stored at offset n_direct in synthetic layout
    assert w.sum() == graph.num_edges_padded - ei.shape[1] * 0 - 2  # only 2 edges dropped


def test_evaluate_pipeline_runs(training_setup):
    graph, ei, et, index, cfg, params = training_setup
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)[:10]
    metrics = evaluate(
        params, cfg, graph, triples, index, batch_size=4,
        metrics=("mr", "mrr", "hits@1", "hits@10", "hits@10_50", "mrr-tail"),
    )
    assert set(metrics) == {"mr", "mrr", "hits@1", "hits@10", "hits@10_50", "mrr-tail"}
    assert 1.0 <= metrics["mr"] <= graph.num_nodes
    assert 0.0 < metrics["mrr"] <= 1.0
    assert 0.0 <= metrics["hits@10"] <= 1.0


def test_perfect_model_gets_mrr_1(training_setup):
    """Ranking machinery sanity: a model scoring the true tail highest must
    produce rank 1 under the filtered mask."""
    graph, ei, et, index, cfg, params = training_setup
    from ultra_tpu.tasks import compute_ranking

    pred = jnp.asarray(np.full((2, graph.num_nodes), -5.0, np.float32))
    target = jnp.asarray(np.array([3, 7]))
    pred = pred.at[jnp.arange(2), target].set(10.0)
    # filtered masks always exclude the positive itself (tasks.py:113,128)
    mask = jnp.ones((2, graph.num_nodes), bool).at[jnp.arange(2), target].set(False)
    rank = compute_ranking(pred, target, mask)
    np.testing.assert_array_equal(np.asarray(rank), [1, 1])


def test_remat_matches_no_remat(training_setup):
    """jax.checkpoint'd layers must not change values or gradients."""
    import jax
    from ultra_tpu.train.loop import make_train_step

    graph, ei, et, index, cfg, params = training_setup
    cfg_remat = cfg.replace(
        relation_model=cfg.relation_model.replace(remat=True),
        entity_model=cfg.entity_model.replace(remat=True),
    )
    opt = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(5)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch = tasks.negative_sampling(index, triples[:4], num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)

    outs = []
    for c in (cfg, cfg_remat):
        step = make_train_step(c, opt, num_negative=4)
        state = init_train_state(params, opt)
        state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
        outs.append((float(loss), state.params))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_cached_relation_eval_matches(training_setup):
    """Precomputed relation representations must not change eval metrics."""
    graph, ei, et, index, cfg, params = training_setup
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)[:12]
    m1 = evaluate(params, cfg, graph, triples, index, batch_size=4,
                  metrics=("mrr", "hits@3"), cache_relations=False)
    m2 = evaluate(params, cfg, graph, triples, index, batch_size=4,
                  metrics=("mrr", "hits@3"), cache_relations=True)
    np.testing.assert_allclose(m1["mrr"], m2["mrr"], rtol=1e-5)
    np.testing.assert_allclose(m1["hits@3"], m2["hits@3"], rtol=1e-5)


def test_grad_accum_matches_full_batch():
    """grad_accum micro-stepping == the full-batch step exactly (the loss
    is a mean over batch rows; the easy-edge mask covers the whole batch in
    both cases) — the pretrain-width lever (bs 64 as 2x bs 32)."""
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import synthetic_graph
    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
    from ultra_tpu.train.loop import (
        init_train_state, init_ultra_params, make_optimizer, make_train_step,
    )

    graph, ei, et = synthetic_graph(num_nodes=30, num_direct_rel=4,
                                    num_triples=150, seed=2)
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    dims = (16, 16)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(input_dim=16, hidden_dims=dims, num_relation=1,
                                  project_relations=True),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    opt = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(0)
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rows = triples[rng.choice(len(triples), size=8, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=4, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch, ew = jnp.asarray(batch), jnp.asarray(ew)

    step1 = make_train_step(cfg, opt, num_negative=4)
    s1, l1 = step1(init_train_state(params, opt), graph, batch, ew)
    step2 = make_train_step(cfg, opt, num_negative=4, grad_accum=2)
    s2, l2 = step2(init_train_state(params, opt), graph, batch, ew)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
