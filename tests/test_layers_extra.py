"""Non-flagship conv options: rotate message, mean/max/pna aggregation,
dependent relations, concat_hidden — against the independent torch oracle
or self-consistency invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.layers import ConvConfig, conv_apply
from ultra_tpu.models.nbfnet import NBFNetConfig, rel_nbfnet_apply
from ultra_tpu.train.loop import init_ultra_params


def make_layer_params(rng, d, num_rel, in_mult=2):
    return {
        "linear": {
            "w": jnp.asarray(rng.normal(size=(in_mult * d, d), scale=0.1).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.01),
        },
        "layer_norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "relation": jnp.asarray(rng.normal(size=(num_rel, d)).astype(np.float32)),
    }


@pytest.fixture
def graph_setup():
    graph, ei, et = synthetic_graph(num_nodes=18, num_direct_rel=3, num_triples=50, seed=6)
    rng = np.random.default_rng(0)
    d, b = 8, 2
    x = jnp.asarray(rng.normal(size=(graph.num_nodes, b, d)).astype(np.float32))
    boundary = jnp.asarray(rng.normal(size=(graph.num_nodes, b, d)).astype(np.float32))
    query = jnp.ones((b, d), jnp.float32)
    return graph, rng, d, b, x, boundary, query


def test_rotate_message(graph_setup):
    graph, rng, d, b, x, boundary, query = graph_setup
    params = make_layer_params(rng, d, graph.num_relations)
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        message_func="rotate", aggregate_func="sum",
    )
    out = conv_apply(params, cfg, graph, x, boundary, query=query)
    assert out.shape == x.shape

    # oracle: per-edge complex rotation summed per dst + boundary
    ei = np.asarray(graph.edge_index)
    et = np.asarray(graph.edge_type)
    xe = np.asarray(x)[ei[1]]
    re = np.asarray(params["relation"])[et][:, None, :]
    h = d // 2
    msg = np.concatenate(
        [xe[..., :h] * re[..., :h] - xe[..., h:] * re[..., h:],
         xe[..., :h] * re[..., h:] + xe[..., h:] * re[..., :h]], axis=-1,
    ) * np.asarray(graph.edge_weight)[:, None, None]
    upd = np.zeros_like(np.asarray(x))
    np.add.at(upd, ei[0], msg)
    upd = upd + np.asarray(boundary)
    z = np.concatenate([np.asarray(x), upd], axis=-1) @ np.asarray(params["linear"]["w"]) + np.asarray(params["linear"]["b"])
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    expect = np.maximum((z - mu) / np.sqrt(var + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("agg", ["mean", "max", "pna"])
def test_rotate_all_aggregators(graph_setup, agg):
    """rotate x {mean,max,pna} against an independent numpy oracle
    (reference fallback supports these, layers.py:135-181)."""
    graph, rng, d, b, x, boundary, query = graph_setup
    in_mult = 13 if agg == "pna" else 2
    params = make_layer_params(rng, d, graph.num_relations, in_mult=in_mult)
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        message_func="rotate", aggregate_func=agg,
    )
    out = conv_apply(params, cfg, graph, x, boundary, query=query)
    assert out.shape == (graph.num_nodes, b, d)

    # numpy oracle: per-edge complex rotation, then the aggregation
    ei = np.asarray(graph.edge_index)
    et = np.asarray(graph.edge_type)
    ew = np.asarray(graph.edge_weight)
    xe = np.asarray(x)[ei[1]]
    re = np.asarray(params["relation"])[et][:, None, :]
    h = d // 2
    msg = np.concatenate(
        [xe[..., :h] * re[..., :h] - xe[..., h:] * re[..., h:],
         xe[..., :h] * re[..., h:] + xe[..., h:] * re[..., :h]], axis=-1,
    )
    live = ew != 0.0
    wmsg = msg * ew[:, None, None]
    v = graph.num_nodes
    bnd = np.asarray(boundary)
    deg = np.zeros(v)
    np.add.at(deg, ei[0][live], 1.0)
    deg = deg[:, None, None] + 1.0

    def seg_sum(m):
        out_ = np.zeros_like(bnd)
        np.add.at(out_, ei[0], m * ew[:, None, None])
        return out_

    def seg_ext(m, is_min):
        fill = np.inf if is_min else -np.inf
        out_ = np.full_like(bnd, fill)
        op = np.minimum if is_min else np.maximum
        for e in np.nonzero(live)[0]:
            out_[ei[0][e]] = op(out_[ei[0][e]], m[e] * ew[e])
        return out_

    if agg == "mean":
        upd = (seg_sum(msg) + bnd) / deg
    elif agg == "max":
        upd = np.maximum(seg_ext(msg, False), bnd)
    else:  # pna
        mean = (seg_sum(msg) + bnd) / deg
        sq_mean = (seg_sum(np.square(msg)) + np.square(bnd)) / deg
        mx = np.maximum(seg_ext(msg, False), bnd)
        mn = np.minimum(seg_ext(msg, True), bnd)
        std = np.sqrt(np.clip(sq_mean - np.square(mean), 1e-6, None))
        feats = np.stack([mean, mx, mn, std], axis=-1).reshape(v, b, 4 * d)
        scale = np.log(deg)
        scale = scale / scale.mean()
        scales = np.concatenate(
            [np.ones_like(scale), scale, 1.0 / np.clip(scale, 1e-2, None)], axis=-1
        )
        upd = (feats[..., None] * scales[..., None, :]).reshape(v, b, 12 * d)

    z = np.concatenate([np.asarray(x), upd], axis=-1) @ np.asarray(params["linear"]["w"]) \
        + np.asarray(params["linear"]["b"])
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    expect = np.maximum((z - mu) / np.sqrt(var + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("agg", ["sum", "mean"])
def test_rotate_fused_plans_match_xla_with_grads(graph_setup, agg):
    """The fused rotate path (one distmult rspmm at 2x width) must agree
    with the plan-free XLA path on values AND gradients when Pallas plans
    are attached — rotate is now first-class on the kernel path for
    sum/mean (round-4 verdict #8)."""
    from ultra_tpu.ops.rspmm_pallas import attach_plans

    graph, rng, d, b, x, boundary, query = graph_setup
    params = make_layer_params(rng, d, graph.num_relations)
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        message_func="rotate", aggregate_func=agg,
    )
    graph_p = attach_plans(graph, rb=16, chunk=32)
    assert graph_p.plans is not None and graph_p.plans.v2 is not None

    def loss(g):
        def f(p, xx):
            out = conv_apply(p, cfg, g, xx, boundary, query=query)
            return jnp.sum(jnp.sin(out))

        return jax.value_and_grad(f, argnums=(0, 1))(params, x)

    (l_p, (gp_params, gp_x)) = loss(graph_p)
    (l_x, (gx_params, gx_x)) = loss(graph)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x),
                               rtol=5e-3, atol=5e-4)
    for a, c in zip(jax.tree.leaves(gp_params), jax.tree.leaves(gx_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("agg", ["mean", "max", "pna"])
def test_aggregators_match_torch_oracle(graph_setup, agg):
    from tests.oracle_torch import rspmm_oracle
    import torch

    graph, rng, d, b, x, boundary, query = graph_setup
    in_mult = 13 if agg == "pna" else 2
    params = make_layer_params(rng, d, graph.num_relations, in_mult=in_mult)
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        message_func="distmult", aggregate_func=agg,
    )
    out = conv_apply(params, cfg, graph, x, boundary, query=query)
    assert out.shape == (graph.num_nodes, b, d)
    assert np.isfinite(np.asarray(out)).all()

    if agg == "max":
        # cross-check the max aggregation against the torch oracle path
        rel_t = torch.as_tensor(np.asarray(params["relation"]))[None].expand(b, -1, -1)
        x_t = torch.as_tensor(np.asarray(x)).permute(1, 0, 2)
        upd = rspmm_oracle(
            np.asarray(graph.edge_index), np.asarray(graph.edge_type),
            np.asarray(graph.edge_weight), rel_t, x_t, graph.num_nodes, "max", "mul",
        )
        upd = torch.maximum(upd, torch.as_tensor(np.asarray(boundary)).permute(1, 0, 2))
        z = torch.cat([x_t, upd], dim=-1) @ torch.as_tensor(np.asarray(params["linear"]["w"])) \
            + torch.as_tensor(np.asarray(params["linear"]["b"]))
        z = torch.nn.functional.layer_norm(
            z, (d,), torch.as_tensor(np.asarray(params["layer_norm"]["scale"])),
            torch.as_tensor(np.asarray(params["layer_norm"]["bias"])),
        ).relu()
        np.testing.assert_allclose(
            np.asarray(out), z.permute(1, 0, 2).numpy(), rtol=2e-4, atol=2e-5
        )


def test_dependent_relations(graph_setup):
    graph, rng, d, b, x, boundary, query = graph_setup
    params = {
        "linear": {
            "w": jnp.asarray(rng.normal(size=(2 * d, d), scale=0.1).astype(np.float32)),
            "b": jnp.zeros(d),
        },
        "layer_norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "relation_linear": {
            "w": jnp.asarray(rng.normal(size=(d, graph.num_relations * d), scale=0.1).astype(np.float32)),
            "b": jnp.zeros(graph.num_relations * d),
        },
    }
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        dependent=True,
    )
    out = conv_apply(params, cfg, graph, x, boundary, query=query)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_concat_hidden_rel_nbfnet(graph_setup):
    graph, rng, d, b, x, boundary, query = graph_setup
    rel_graph = graph.relation_graph
    cfg = NBFNetConfig(
        input_dim=d, hidden_dims=(d, d), num_relation=4, concat_hidden=True
    )
    layers = [make_layer_params(rng, d, 4) for _ in range(2)]
    feat = 3 * d  # sum(hidden) + input
    params = {
        "layers": layers,
        "mlp": [
            {"w": jnp.asarray(rng.normal(size=(feat, feat), scale=0.1).astype(np.float32)), "b": jnp.zeros(feat)},
            {"w": jnp.asarray(rng.normal(size=(feat, d), scale=0.1).astype(np.float32)), "b": jnp.zeros(d)},
        ],
    }
    out = rel_nbfnet_apply(params, cfg, rel_graph, jnp.asarray(np.array([0, 2])))
    assert out.shape == (2, rel_graph.num_nodes, d)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("agg", ["pna", "max"])
def test_aggregator_gradients_plans_vs_xla(graph_setup, agg):
    """conv_apply VJP with Pallas plans attached (the on-chip path, now the
    v2 min/max gradient kernels) == the plan-free XLA path. Covers the PNA
    composition: 3 routed min/max VJPs + 2 sum VJPs per layer."""
    from ultra_tpu.ops.rspmm_pallas import attach_plans

    graph, rng, d, b, x, boundary, query = graph_setup
    in_mult = 13 if agg == "pna" else 2
    params = make_layer_params(rng, d, graph.num_relations, in_mult=in_mult)
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relation=graph.num_relations,
        message_func="distmult", aggregate_func=agg,
    )
    graph_p = attach_plans(graph, rb=16, chunk=32)
    assert graph_p.plans is not None and graph_p.plans.v2 is not None

    def loss(g):
        def f(p, xx):
            out = conv_apply(p, cfg, g, xx, boundary, query=query)
            return jnp.sum(jnp.sin(out))

        return jax.value_and_grad(f, argnums=(0, 1))(params, x)

    (l_p, (gp_params, gp_x)) = loss(graph_p)
    (l_x, (gx_params, gx_x)) = loss(graph)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x),
                               rtol=5e-3, atol=5e-4)
    for a, c in zip(jax.tree.leaves(gp_params), jax.tree.leaves(gx_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=5e-4)
