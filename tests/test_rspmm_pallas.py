"""Pallas rspmm kernel vs the XLA reference backend (interpreter mode on
CPU; the same kernel compiles for TPU). Covers forward (mul/add), runtime
weight masking through the plan permutation, and both backward operands."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.graph import make_graph
from ultra_tpu.ops.rspmm import generalized_rspmm, rspmm_from_graph
from ultra_tpu.ops.rspmm_pallas import GraphPlans, attach_plans, rspmm_pallas_sum


def make_inputs(rng, v=70, r=11, e=300, b=2, d=64):
    ei = rng.integers(0, v, size=(2, e)).astype(np.int32)
    et = rng.integers(0, r, size=e).astype(np.int32)
    ew = np.ones(e, dtype=np.float32)
    rel = rng.normal(size=(r, b, d)).astype(np.float32)
    x = rng.normal(size=(v, b, d)).astype(np.float32)
    return ei, et, ew, rel, x


@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_forward_matches_xla(rng, mul_op):
    ei, et, ew, rel, x = make_inputs(rng)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=384)
    graph = attach_plans(graph, rb=32, chunk=64)

    out_p = rspmm_pallas_sum(
        mul_op, v, None, graph.plans, jnp.asarray(rel), jnp.asarray(x), graph.edge_weight
    )
    out_x = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
        jnp.asarray(rel), jnp.asarray(x), sum="add", mul=mul_op, backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-3, atol=2e-3)


def test_pallas_respects_runtime_weight_mask(rng):
    """Zeroing weights of live edges at runtime (easy-edge dropout) must be
    honored without rebuilding the plan."""
    ei, et, ew, rel, x = make_inputs(rng, e=200)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=64)

    w_masked = np.asarray(graph.edge_weight).copy()
    dropped = np.arange(0, 200, 7)
    w_masked[dropped] = 0.0
    graph_m = graph.replace(edge_weight=jnp.asarray(w_masked))

    out_p = rspmm_from_graph(graph_m, jnp.asarray(rel), jnp.asarray(x))
    out_x = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(w_masked[:200]),
        jnp.asarray(rel), jnp.asarray(x), sum="add", mul="mul", backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_gradients_match_xla(rng, mul_op):
    ei, et, ew, rel, x = make_inputs(rng, v=50, r=7, e=180)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=64)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss_pallas(rel, x):
        out = rspmm_pallas_sum(mul_op, v, None, graph.plans, rel, x, graph.edge_weight)
        return jnp.sum(jnp.sin(out))

    def loss_xla(rel, x):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel, x,
            sum="add", mul=mul_op, backend="xla",
        )
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(rel_j, x_j)
    gx = jax.grad(loss_xla, argnums=(0, 1))(rel_j, x_j)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_model_forward_with_plans_matches_without(rng):
    """End-to-end: Ultra forward with pallas-planned graphs == XLA path."""
    from ultra_tpu.data.synthetic import synthetic_graph
    from ultra_tpu.models.nbfnet import UltraConfig, NBFNetConfig, ultra_score_all
    from ultra_tpu.train.loop import init_ultra_params

    graph, ei, et = synthetic_graph(num_nodes=40, num_direct_rel=5, num_triples=150, seed=2)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    h = jnp.asarray(np.array([1, 5]))
    r = jnp.asarray(np.array([0, 3]))

    ref = ultra_score_all(params, cfg, graph, h, r_index=r)

    graph_p = attach_plans(graph, rb=32, chunk=64)
    graph_p = graph_p.replace(relation_graph=attach_plans(graph.relation_graph, rb=8, chunk=64))
    out = ultra_score_all(params, cfg, graph_p, h, r_index=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("sum_op", ["max", "min"])
@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_minmax_matches_xla(rng, sum_op, mul_op):
    ei, et, ew, rel, x = make_inputs(rng, v=60, r=9, e=260)
    # runtime-masked edges anywhere in the chunk stream
    ew = np.ones(260, np.float32)
    ew[rng.integers(0, 260, size=40)] = 0.0
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0],
                       edge_weight=ew, pad_to=320)
    graph = attach_plans(graph, rb=32, chunk=32)

    out_p = rspmm_from_graph(graph, jnp.asarray(rel), jnp.asarray(x), sum=sum_op, mul=mul_op)
    out_x = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
        jnp.asarray(rel), jnp.asarray(x), sum=sum_op, mul=mul_op, backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-3, atol=2e-3)


def test_pna_with_plans_runs(rng):
    """PNA aggregation end-to-end on the planned (pallas) path."""
    from ultra_tpu.models.layers import ConvConfig, conv_apply

    ei, et, ew, rel, x = make_inputs(rng, v=40, r=5, e=150, b=2, d=8)
    graph = make_graph(ei, et, num_nodes=40, num_relations=5, pad_to=192)
    graph = attach_plans(graph, rb=16, chunk=32)
    params = {
        "linear": {
            "w": jnp.asarray(rng.normal(size=(13 * 8, 8), scale=0.1).astype(np.float32)),
            "b": jnp.zeros(8),
        },
        "layer_norm": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        "relation": jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32)),
    }
    cfg = ConvConfig(input_dim=8, output_dim=8, num_relation=5, aggregate_func="pna")
    boundary = jnp.asarray(rng.normal(size=(40, 2, 8)).astype(np.float32))
    out = conv_apply(params, cfg, graph, boundary, boundary,
                     query=jnp.ones((2, 8), jnp.float32))
    ref = conv_apply(params, cfg, graph.replace(plans=None), boundary, boundary,
                     query=jnp.ones((2, 8), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("sum_op", ["max", "min"])
@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_minmax_gradients_match_xla(rng, sum_op, mul_op):
    ei, et, ew, rel, x = make_inputs(rng, v=50, r=7, e=180)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=32)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss_pallas(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum=sum_op, mul=mul_op)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    def loss_xla(rel, x):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel, x,
            sum=sum_op, mul=mul_op, backend="xla",
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(rel_j, x_j)
    gx = jax.grad(loss_xla, argnums=(0, 1))(rel_j, x_j)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("agg", ["add", "max"])
def test_precision_highest_plumbs_through(rng, agg):
    """precision='highest' (exact-f32 MXU mode for parity runs) must flow
    through forward and both gradient kernels for every aggregator; in
    interpret mode (CPU) results equal the default-precision path exactly."""
    ei, et, ew, rel, x = make_inputs(rng, v=40, r=5, e=150)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=64)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss(precision):
        def f(rel, x):
            out = rspmm_from_graph(
                graph, rel, x, sum=agg, mul="mul", precision=precision
            )
            out = jnp.where(jnp.isfinite(out), out, 0.0)
            return jnp.sum(jnp.sin(out))

        return jax.value_and_grad(f, argnums=(0, 1))(rel_j, x_j)

    (l_hi, g_hi), (l_df, g_df) = loss("highest"), loss(None)
    np.testing.assert_allclose(float(l_hi), float(l_df), rtol=1e-6)
    for a, b in zip(g_hi, g_df):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_weight_grad_matches_xla(rng, mul_op):
    """d/d edge_weight through the fused Pallas VJP == XLA backend
    (reference weight_grad contract, rspmm.cpp:106-114)."""
    ei, et, ew, rel, x = make_inputs(rng, v=50, r=7, e=180)
    ew = rng.uniform(0.5, 2.0, size=ew.shape).astype(np.float32)
    ew[rng.uniform(size=ew.shape) < 0.15] = 0.0
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    w_pad = np.zeros(graph.num_edges_padded, np.float32)
    w_pad[: ew.shape[0]] = ew
    graph = graph.replace(edge_weight=jnp.asarray(w_pad))
    graph = attach_plans(graph, rb=32, chunk=64)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss_pallas(w):
        out = rspmm_pallas_sum(mul_op, v, None, graph.plans, rel_j, x_j, w)
        return jnp.sum(jnp.sin(out))

    def loss_xla(w):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), w[: ew.shape[0]], rel_j, x_j,
            sum="add", mul=mul_op, backend="xla",
        )
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas)(graph.edge_weight)
    gx = jax.grad(loss_xla)(graph.edge_weight)
    # plan-covered edges are the build-time live ones; others must be 0
    live = w_pad != 0.0
    np.testing.assert_allclose(
        np.asarray(gp)[live], np.asarray(gx)[live], rtol=5e-3, atol=5e-3
    )
    assert np.all(np.asarray(gp)[~live] == 0.0)


@pytest.mark.parametrize("sum_op", ["min", "max"])
@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_pallas_minmax_weight_grad_matches_xla(rng, sum_op, mul_op):
    from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_minmax

    ei, et, ew, rel, x = make_inputs(rng, v=40, r=5, e=150)
    ew = rng.uniform(0.5, 2.0, size=ew.shape).astype(np.float32)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=192)
    w_pad = np.zeros(graph.num_edges_padded, np.float32)
    w_pad[: ew.shape[0]] = ew
    graph = graph.replace(edge_weight=jnp.asarray(w_pad))
    graph = attach_plans(graph, rb=32, chunk=64)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss_pallas(w):
        out = rspmm_pallas_minmax(graph.plans, rel_j, x_j, w, mul_op, sum_op, v)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    def loss_xla(w):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), w[: ew.shape[0]], rel_j, x_j,
            sum=sum_op, mul=mul_op, backend="xla",
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas)(graph.edge_weight)
    gx = jax.grad(loss_xla)(graph.edge_weight)
    live = w_pad != 0.0
    np.testing.assert_allclose(
        np.asarray(gp)[live], np.asarray(gx)[live], rtol=5e-3, atol=5e-3
    )


def test_v2_feature_slicing_matches_unsliced(rng, monkeypatch):
    """Wide feature axes run as independent F-slices (SLICE_BYTES cap) —
    forward and both gradients must match the unsliced path exactly."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    ei, et, ew, rel, x = make_inputs(rng, v=40, r=5, e=150, b=4, d=64)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=192)
    graph = attach_plans(graph, rb=32, chunk=64)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss(r_, x_):
        out = rspmm_pallas_sum("mul", v, None, graph.plans, r_, x_, graph.edge_weight)
        return jnp.sum(jnp.sin(out))

    l0, (gr0, gx0) = jax.value_and_grad(loss, argnums=(0, 1))(rel_j, x_j)

    # force slicing: cap the stream to one 128-wide slice per pass
    monkeypatch.setattr(v2mod, "SLICE_BYTES", graph.plans.v2.e_pad * 2 * 128)
    assert v2mod._f_slice_width(graph.plans.v2.e_pad, 4 * 64) == 128
    l1, (gr1, gx1) = jax.value_and_grad(loss, argnums=(0, 1))(rel_j, x_j)

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gr1), np.asarray(gr0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sum_op", ["min", "max"])
def test_v2_minmax_primal_matches_xla(rng, sum_op):
    """The undifferentiated min/max primal runs the v2 gather+fold kernel
    (sort_slots=False shared plan); gradients keep the v1 fwd+bwd pair so
    tie routing compares bit-identical values (see _minmax_vjp)."""
    from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_minmax

    ei, et, ew, rel, x = make_inputs(rng, v=60, r=7, e=400)
    ew = (rng.random(ew.shape[0]) > 0.2).astype(np.float32)  # masked edges
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=512)
    w_pad = np.zeros(graph.num_edges_padded, np.float32)
    w_pad[: ew.shape[0]] = ew
    graph = graph.replace(edge_weight=jnp.asarray(w_pad))
    graph = attach_plans(graph, rb=32, chunk=64)
    assert graph.plans.v2 is not None and not graph.plans.v2.sorted_slots

    for mul_op in ("mul", "add"):
        out = rspmm_pallas_minmax(
            graph.plans, jnp.asarray(rel), jnp.asarray(x), graph.edge_weight,
            mul_op, sum_op, v,
        )
        ref = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
            jnp.asarray(rel), jnp.asarray(x), sum=sum_op, mul=mul_op,
            backend="xla",
        )
        o, r_ = np.asarray(out), np.asarray(ref)
        fin = np.isfinite(r_)
        assert (np.isfinite(o) == fin).all()
        np.testing.assert_allclose(o[fin], r_[fin], rtol=2e-3, atol=2e-3)


def test_pad_plan_v2_preserves_results(rng):
    """A cross-shard-padded PlanV2 (extra dead edges, pad table groups,
    larger compact space) must produce identical forward and rel-grad
    results to the unpadded plan."""
    from ultra_tpu.ops.rspmm_pallas_v2 import (
        ALIGN, build_plan_v2, pad_plan_v2, rspmm_v2_drel, rspmm_v2_fwd,
    )

    ei, et, ew, rel, x = make_inputs(rng, v=50, r=6, e=250, b=1, d=64)
    v = x.shape[0]
    e = ei.shape[1]
    rel2, x2 = rel.reshape(rel.shape[0], -1), x.reshape(v, -1)
    w_ext = jnp.concatenate([jnp.asarray(ew), jnp.zeros(1, jnp.float32)])
    grad = jnp.asarray(rng.normal(size=x2.shape).astype(np.float32))

    plan = build_plan_v2(ei, et, v, rel.shape[0], chunk=64, sort_slots=False,
                         dead_slot=e)
    padded = pad_plan_v2(
        plan, plan.e_pad + 2 * ALIGN, plan.n_groups + 2,
        plan.n_compact_pad + plan.rb2, dead_slot=e,
    )
    for p in (plan, padded):
        out = rspmm_v2_fwd(p, jnp.asarray(rel2), jnp.asarray(x2), w_ext,
                           mul="mul", out_rows=v)
        drel = rspmm_v2_drel(p, jnp.asarray(x2), grad, w_ext, rel.shape[0])
        if p is plan:
            out0, drel0 = out, drel
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(drel), np.asarray(drel0),
                               rtol=1e-5, atol=1e-6)


def test_build_plan_v2_tw_auto_escalation(rng):
    """When the requested table width can't hold some single chunk's
    distinct types (uniform histograms), the planner escalates once to the
    feasibility floor round_up(max per-chunk distinct, 8) instead of
    jumping to the global r_pad-row table (measured 7-15% faster across
    fwd/d_x/d_rel on chip — output/r4/uniform_tw3.log); results must match
    the global-table layout."""
    from ultra_tpu.ops.rspmm_pallas_v2 import (
        build_plan_v2, rspmm_v2_drel, rspmm_v2_fwd,
    )

    r = 100  # r_pad = 104
    ei, et, ew, rel, x = make_inputs(rng, v=50, r=r, e=3000, b=1, d=64)
    v, e = x.shape[0], ei.shape[1]
    rel2, x2 = rel.reshape(rel.shape[0], -1), x.reshape(v, -1)
    w_ext = jnp.concatenate([jnp.asarray(ew), jnp.zeros(1, jnp.float32)])
    grad = jnp.asarray(rng.normal(size=x2.shape).astype(np.float32))

    esc = build_plan_v2(ei, et, v, r, chunk=64, tw=8, dead_slot=e)
    glob = build_plan_v2(ei, et, v, r, chunk=64, cluster=False, dead_slot=e)
    assert glob.tw == 104 and glob.n_groups == 1
    assert 8 < esc.tw < glob.tw and esc.tw % 8 == 0, esc.tw
    assert esc.n_groups > 1

    got = []
    for plan in (esc, glob):
        out = rspmm_v2_fwd(plan, jnp.asarray(rel2), jnp.asarray(x2), w_ext,
                           mul="mul", out_rows=v)
        drel = rspmm_v2_drel(plan, jnp.asarray(x2), grad, w_ext, r)
        got.append((np.asarray(out), np.asarray(drel)))
    np.testing.assert_allclose(got[0][0], got[1][0], rtol=1e-5, atol=1e-6)
    # drel accumulates in a different group order -> f32 rounding noise
    np.testing.assert_allclose(got[0][1], got[1][1], rtol=5e-4, atol=1e-5)


def test_build_plan_v2_tw_escalation_acceptance_gate(rng, monkeypatch):
    """Escalated widths whose total table rows exceed TW_ACCEPT * e_pad
    must fall back to the global table (measured: 0.31*e_pad of tables
    LOSES 13% to the global layout — output/r4/bench_autotw.log)."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    r = 100
    ei, et, ew, rel, x = make_inputs(rng, v=50, r=r, e=3000, b=1, d=64)
    e = ei.shape[1]
    monkeypatch.setattr(v2mod, "TW_ACCEPT", 0.001)
    plan = v2mod.build_plan_v2(ei, et, x.shape[0], r, chunk=64, tw=8,
                               dead_slot=e)
    assert plan.tw == 104 and plan.n_groups == 1  # global fallback


def test_attach_plans_v2_sort_slots_minmax_fallback(rng):
    """attach_plans(v2_sort_slots=True) (sum/mean-only models) marks the
    v2 plans sorted; min/max ops must then dispatch to the v1 kernel and
    stay correct (sorted fold slots break the min/max scan segments)."""
    from ultra_tpu.ops.rspmm_pallas import _minmax_v2_eligible

    ei, et, ew, rel, x = make_inputs(rng, v=40, r=6, e=200, b=1, d=64)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0],
                       pad_to=256)
    graph = attach_plans(graph, rb=64, chunk=64, v2_sort_slots=True)
    assert graph.plans.v2.sorted_slots and graph.plans.v2src.sorted_slots
    assert not _minmax_v2_eligible(graph.plans, 64)

    out = rspmm_from_graph(graph, jnp.asarray(rel), jnp.asarray(x),
                           sum="max", mul="mul")
    ref = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), jnp.asarray(rel),
        jnp.asarray(x), sum="max", mul="mul", backend="xla",
    )
    o, r_ = np.asarray(out), np.asarray(ref)
    fin = np.isfinite(r_)
    assert (np.isfinite(o) == fin).all()
    np.testing.assert_allclose(o[fin], r_[fin], rtol=2e-3, atol=2e-3)


def test_sharded_plans_unify_escalated_widths(rng):
    """build_sharded_plans: when shards' auto-escalated table widths
    differ (one shard clusters at the requested width, another escalates
    to its feasibility floor), all shards rebuild at max(tw) so the
    stacked plan keeps one static shape — and the per-shard partials must
    still sum to the full forward."""
    from ultra_tpu.graph import make_graph
    from ultra_tpu.ops.rspmm_pallas import build_sharded_plans
    from ultra_tpu.ops.rspmm_pallas_v2 import rspmm_v2_fwd

    v, r, e = 80, 200, 4096  # r_pad = 200
    ei = rng.integers(0, v, size=(2, e)).astype(np.int32)
    # first half: 10 relation types (clusters at tw=128); second half:
    # ~140 uniform types (floor ~144 -> escalates past the requested 128)
    et = np.concatenate([
        rng.integers(0, 10, size=e // 2),
        rng.integers(0, 140, size=e // 2),
    ]).astype(np.int32)
    graph = make_graph(ei, et, num_nodes=v, num_relations=r, pad_to=e)
    host = (ei.astype(np.int64), et.astype(np.int64), np.ones(e, np.float32))
    graph = build_sharded_plans(graph, 2, rb=32, chunk=32, host_edges=host)

    p2 = graph.plans.v2
    assert p2.src_p.ndim == 2  # stacked (shard, E_pad)
    assert 128 < p2.tw < 200, p2.tw  # unified at the escalated floor

    f = 64
    x = jnp.asarray(rng.normal(size=(v, f)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(r, f)).astype(np.float32))
    w_ext = jnp.concatenate([jnp.ones(e, jnp.float32),
                             jnp.zeros(1, jnp.float32)])
    total = sum(
        rspmm_v2_fwd(jax.tree.map(lambda a, i=i: a[i], p2), rel, x, w_ext,
                     mul="mul", out_rows=v)
        for i in range(2)
    )
    oracle = np.zeros((v, f), np.float64)
    np.add.at(oracle, ei[0],
              np.asarray(x, np.float64)[ei[1]] * np.asarray(rel, np.float64)[et])
    np.testing.assert_allclose(np.asarray(total), oracle, rtol=2e-4, atol=2e-4)


def test_v2_stream_int8_probe(rng, monkeypatch):
    """ULTRA_V2_STREAM_INT8 (eval-only quantized gather stream): per-row
    int8 with the scale folded into the edge weight must stay within
    row-scale quantization error of the exact forward, and must NOT
    engage for transe (additive messages cannot fold the scale)."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    ei, et, ew, rel, x = make_inputs(rng, v=60, r=9, e=500, b=1, d=64)
    v, e = x.shape[0], ei.shape[1]
    rel2, x2 = rel.reshape(rel.shape[0], -1), x.reshape(v, -1)
    w_ext = jnp.concatenate([jnp.asarray(ew), jnp.zeros(1, jnp.float32)])
    plan = v2mod.build_plan_v2(ei, et, v, rel.shape[0], chunk=64, dead_slot=e)

    exact = np.asarray(v2mod.rspmm_v2_fwd(plan, jnp.asarray(rel2),
                                          jnp.asarray(x2), w_ext,
                                          mul="mul", out_rows=v))
    monkeypatch.setattr(v2mod, "STREAM_INT8", True)
    q = np.asarray(v2mod.rspmm_v2_fwd(plan, jnp.asarray(rel2),
                                      jnp.asarray(x2), w_ext,
                                      mul="mul", out_rows=v))
    rel_err = np.abs(q - exact) / (np.abs(exact) + 1e-6)
    assert np.isfinite(q).all()
    assert 0 < float(rel_err.mean()) < 0.08, float(rel_err.mean())

    # transe stays exact (gate must not engage)
    for m in ("add",):
        a = np.asarray(v2mod.rspmm_v2_fwd(plan, jnp.asarray(rel2),
                                          jnp.asarray(x2), w_ext,
                                          mul=m, out_rows=v))
        monkeypatch.setattr(v2mod, "STREAM_INT8", False)
        b = np.asarray(v2mod.rspmm_v2_fwd(plan, jnp.asarray(rel2),
                                          jnp.asarray(x2), w_ext,
                                          mul=m, out_rows=v))
        np.testing.assert_array_equal(a, b)


def test_v2_stream_int8_disabled_under_differentiation(rng, monkeypatch):
    """Setting the eval-only STREAM_INT8 flag in a training process must be
    a no-op for value_and_grad: the custom-VJP fwd and the d_x backward
    both pass int8_ok=False, so loss AND grads stay bit-identical to the
    unquantized run (advisor round-4 finding)."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    ei, et, ew, rel, x = make_inputs(rng, v=60, r=9, e=500, b=1, d=64)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0],
                       pad_to=512)
    graph = attach_plans(graph, rb=32, chunk=64)
    assert graph.plans.v2 is not None  # the int8 gate lives on the v2 path
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss(rel, x):
        out = rspmm_pallas_sum("mul", v, None, graph.plans, rel, x,
                               graph.edge_weight)
        return jnp.sum(jnp.sin(out))

    ref = jax.value_and_grad(loss, argnums=(0, 1))(rel_j, x_j)
    monkeypatch.setattr(v2mod, "STREAM_INT8", True)
    quant = jax.value_and_grad(loss, argnums=(0, 1))(rel_j, x_j)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(quant[0]))
    for a, b in zip(ref[1], quant[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_plan_v2_src_sort_preserves_results(rng):
    """``src_sort`` adds a source-row tiebreak to the edge order and a
    min-src tiebreak to the slot order (a gather-DRAM-locality lever);
    forward and rel-grad must match the default layout."""
    from ultra_tpu.ops.rspmm_pallas_v2 import (
        build_plan_v2, rspmm_v2_drel, rspmm_v2_fwd,
    )

    ei, et, ew, rel, x = make_inputs(rng, v=50, r=6, e=250, b=1, d=64)
    v, e = x.shape[0], ei.shape[1]
    rel2, x2 = rel.reshape(rel.shape[0], -1), x.reshape(v, -1)
    w_ext = jnp.concatenate([jnp.asarray(ew), jnp.zeros(1, jnp.float32)])
    grad = jnp.asarray(rng.normal(size=x2.shape).astype(np.float32))
    for sort_slots in (False, True):
        got = []
        for src_sort in (False, True):
            plan = build_plan_v2(ei, et, v, rel.shape[0], chunk=64,
                                 sort_slots=sort_slots, dead_slot=e,
                                 src_sort=src_sort)
            out = rspmm_v2_fwd(plan, jnp.asarray(rel2), jnp.asarray(x2),
                               w_ext, mul="mul", out_rows=v)
            drel = rspmm_v2_drel(plan, jnp.asarray(x2), grad, w_ext,
                                 rel.shape[0])
            got.append((np.asarray(out), np.asarray(drel)))
        np.testing.assert_allclose(got[1][0], got[0][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[1][1], got[0][1], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sum_op,mul_op", [("max", "mul"), ("min", "add")])
def test_minmax_gradients_dispatch_v2(rng, sum_op, mul_op, monkeypatch):
    """VERDICT r2 #4: min/max VJPs must run the v2 gather+fold kernels when
    v2 plans are attached (both generations match the oracle, so only a
    dispatch assertion catches a silent v1 fallback)."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    calls = {"dx": 0, "drel": 0, "fwd": 0}
    for name, key in (("rspmm_v2_minmax_dx", "dx"),
                      ("rspmm_v2_minmax_drel", "drel"),
                      ("rspmm_v2_minmax", "fwd")):
        orig = getattr(v2mod, name)

        def wrap(*a, __o=orig, __k=key, **kw):
            calls[__k] += 1
            return __o(*a, **kw)

        monkeypatch.setattr(v2mod, name, wrap)

    ei, et, ew, rel, x = make_inputs(rng, v=50, r=7, e=180)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=32)
    assert graph.plans.v2 is not None and graph.plans.v2src is not None

    def loss(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum=sum_op, mul=mul_op)
        return jnp.sum(jnp.where(jnp.isfinite(out), jnp.sin(out), 0.0))

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(rel), jnp.asarray(x))
    assert all(np.isfinite(np.asarray(a)).all() for a in g)
    assert calls["fwd"] >= 1 and calls["dx"] >= 1 and calls["drel"] >= 1, calls


def test_sum_transe_relgrad_dispatches_v2(rng, monkeypatch):
    """Sum-aggregation transe rel-grad runs rspmm_v2_drel_add (no x
    stream), not the v1 one-hot kernel."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    calls = {"n": 0}
    orig = v2mod.rspmm_v2_drel_add

    def wrap(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(v2mod, "rspmm_v2_drel_add", wrap)

    ei, et, ew, rel, x = make_inputs(rng, v=50, r=7, e=180)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=256)
    graph = attach_plans(graph, rb=32, chunk=32)

    def loss(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum="add", mul="add")
        return jnp.sum(jnp.sin(out))

    d_rel, _ = jax.grad(loss, argnums=(0, 1))(jnp.asarray(rel), jnp.asarray(x))
    assert calls["n"] == 1
    # parity vs the XLA backend for the same grad
    def loss_x(rel, x):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel, x,
            sum="add", mul="add", backend="xla",
        )
        return jnp.sum(jnp.sin(out))

    d_rel_x, _ = jax.grad(loss_x, argnums=(0, 1))(jnp.asarray(rel), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(d_rel), np.asarray(d_rel_x),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_w3_forward_and_gradients_match_xla(rng, mul_op):
    """w3 (windowed in-kernel gather) sum forward + VJP vs the XLA oracle,
    including runtime weight masking through the plan permutation."""
    ei, et, ew, rel, x = make_inputs(rng, v=70, r=9, e=320)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=384)
    graph = attach_plans(graph, rb=32, chunk=64, w3=True, w3_window=32)
    assert graph.plans.w3 is not None and graph.plans.w3src is not None
    from ultra_tpu.ops.rspmm_pallas_w3 import plan_stats

    stats = plan_stats(graph.plans.w3, 320)
    assert stats["chunks"] * 32 == stats["e_pad"]

    # runtime weight mask flows through the permutation
    w_masked = np.asarray(graph.edge_weight).copy()
    w_masked[np.arange(0, 320, 5)] = 0.0
    graph = graph.replace(edge_weight=jnp.asarray(w_masked))

    def loss_p(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum="add", mul=mul_op)
        return jnp.sum(jnp.sin(out))

    def loss_x(rel, x):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(w_masked[:320]),
            rel, x, sum="add", mul=mul_op, backend="xla",
        )
        return jnp.sum(jnp.sin(out))

    from ultra_tpu.ops import rspmm_pallas_w3 as w3mod

    calls = {"n": 0}
    orig = w3mod.rspmm_w3_fwd

    def wrap(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    import ultra_tpu.ops.rspmm_pallas as rp

    old = w3mod.rspmm_w3_fwd
    w3mod.rspmm_w3_fwd = wrap
    try:
        (lp, gp) = jax.value_and_grad(loss_p, argnums=(0, 1))(
            jnp.asarray(rel), jnp.asarray(x)
        )
    finally:
        w3mod.rspmm_w3_fwd = old
    (lx, gx) = jax.value_and_grad(loss_x, argnums=(0, 1))(
        jnp.asarray(rel), jnp.asarray(x)
    )
    assert calls["n"] >= 2  # primal + d_x both on w3
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("rel_gather", [True, False])
def test_w3_rel_modes_match_xla(rng, rel_gather):
    """Both relation-row mechanisms (same-shape gather from the resident
    relation window vs clustered one-hot select) reproduce the oracle."""
    from ultra_tpu.ops.rspmm_pallas_w3 import build_plan_w3, rspmm_w3_fwd

    ei, et, ew, rel, x = make_inputs(rng, v=60, r=9, e=260, b=1, d=64)
    v = x.shape[0]
    plan = build_plan_w3(ei, et, v, rel.shape[0], window=32,
                         rel_gather=rel_gather, dead_slot=260)
    assert plan.rel_gather == rel_gather
    w_ext = jnp.concatenate([jnp.asarray(ew), jnp.zeros(1, jnp.float32)])
    for mul_op in ("mul", "add"):
        out = rspmm_w3_fwd(
            plan, jnp.asarray(rel.reshape(9, -1)), jnp.asarray(x.reshape(v, -1)),
            w_ext, mul=mul_op, out_rows=v,
        )
        ref = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
            jnp.asarray(rel), jnp.asarray(x), sum="add", mul=mul_op,
            backend="xla",
        ).reshape(v, -1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_pad_plan_v2_empty_shard():
    """An all-empty source plan (a shard that received no live edges from
    np.array_split) must pad to valid in-range group/block ids — group_id
    -1 would drive an out-of-bounds scalar-prefetched table-block read."""
    from ultra_tpu.ops.rspmm_pallas_v2 import (
        ALIGN, build_plan_v2, pad_plan_v2, rspmm_v2_fwd,
    )

    v, r = 40, 6
    ei = np.zeros((2, 0), np.int64)
    et = np.zeros((0,), np.int64)
    plan = build_plan_v2(ei, et, v, r, chunk=64, sort_slots=False, dead_slot=0)
    assert plan.num_chunks == 0 and plan.n_groups == 0
    padded = pad_plan_v2(plan, 2 * ALIGN, 1, plan.n_compact_pad, dead_slot=0)
    gid = np.asarray(padded.group_id)
    assert gid.min() >= 0 and gid.max() < padded.n_groups
    assert np.asarray(padded.k2_blk).min() >= 0
    rel = jnp.asarray(np.random.default_rng(0).normal(size=(r, 64)),
                      dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(v, 64)),
                    dtype=jnp.float32)
    w_ext = jnp.zeros((1,), jnp.float32)  # dead_slot=0 -> all weights 0
    out = rspmm_v2_fwd(padded, rel, x, w_ext, mul="mul", out_rows=v)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_w3_plan_invariants(seed):
    """Every live edge appears exactly once in the w3 layout, with
    consistent (window, block)-local coordinates and nondecreasing block
    order (the output-residency requirement)."""
    from ultra_tpu.ops.rspmm_pallas_w3 import build_plan_w3

    rng = np.random.default_rng(seed)
    v = int(rng.integers(30, 200))
    r = int(rng.integers(3, 12))
    e = int(rng.integers(40, 900))
    w = int(rng.choice([16, 32, 64]))
    rb2 = int(rng.choice([16, 48]))
    ei = rng.integers(0, v, size=(2, e)).astype(np.int64)
    et = rng.integers(0, r, size=e).astype(np.int64)
    plan = build_plan_w3(ei, et, v, r, window=w, rb2=rb2, dead_slot=e)

    k, c = plan.num_chunks, plan.window
    perm = np.asarray(plan.perm)
    srcl = np.asarray(plan.src_local)
    dstl = np.asarray(plan.dst_local)
    win = np.asarray(plan.win_id)
    blk = np.asarray(plan.out_blk)
    rank = np.asarray(plan.rank)

    live = perm != e
    ids, counts = np.unique(perm[live], return_counts=True)
    assert len(ids) == e and (counts == 1).all()  # each edge exactly once
    assert (np.diff(blk) >= 0).all()              # blocks consecutive

    rows, cols = np.nonzero(live)
    eids = perm[rows, cols]
    # global src recovered from (window, local)
    np.testing.assert_array_equal(
        win[rows] * c + srcl[rows, cols], ei[1][eids]
    )
    # global compact dst recovered from (block, local)
    np.testing.assert_array_equal(
        blk[rows] * rb2 + dstl[rows, cols], rank[ei[0][eids]]
    )
    # pad slots carry the sentinel and the dead weight index
    assert (dstl[~live.all(axis=1)] <= rb2).all()
    assert (dstl[rows, cols] < rb2).all()


@pytest.mark.parametrize("mul_op", ["mul", "add"])
def test_v2_rel_gather_matches_xla(rng, mul_op, monkeypatch):
    """The v2 rel-gather variant (relation rows via the same-shape
    in-kernel gather, ULTRA_V2_RELGATHER=1): fwd + full VJP vs the oracle;
    d_rel must still come from the clustered plan."""
    monkeypatch.setenv("ULTRA_V2_RELGATHER", "1")
    ei, et, ew, rel, x = make_inputs(rng, v=60, r=9, e=260)
    v = x.shape[0]
    graph = make_graph(ei, et, num_nodes=v, num_relations=rel.shape[0], pad_to=320)
    graph = attach_plans(graph, rb=32, chunk=64, v2_chunk=64)
    assert graph.plans.v2rg is not None and graph.plans.v2rg.rel_gather
    assert graph.plans.v2 is not None and not graph.plans.v2.rel_gather

    def loss_p(rel_, x_):
        out = rspmm_from_graph(graph, rel_, x_, sum="add", mul=mul_op)
        return jnp.sum(jnp.sin(out))

    def loss_x(rel_, x_):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel_, x_,
            sum="add", mul=mul_op, backend="xla",
        )
        return jnp.sum(jnp.sin(out))

    (lp, gp) = jax.value_and_grad(loss_p, argnums=(0, 1))(
        jnp.asarray(rel), jnp.asarray(x))
    (lx, gx) = jax.value_and_grad(loss_x, argnums=(0, 1))(
        jnp.asarray(rel), jnp.asarray(x))
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_stream_budget_context(rng):
    """stream_budget = unslice-if-it-fits during eval tracing (the fused
    both-direction scorer's 21% win); streams OVER the budget keep the
    TRAINING slicing (mid-width slices measured worst-of-both at 120K/2M —
    evidence/r5/bigmem_eval.log); restores on exit, including on
    exception."""
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    e_pad = 10_000
    train_width = v2mod._f_slice_width(e_pad, 1024)
    with v2mod.stream_budget(e_pad * 2 * 512):
        # fits the budget -> unsliced
        assert v2mod._f_slice_width(e_pad, 512) == 512
        # over the budget -> the training width, NOT a mid-width slice
        assert v2mod._f_slice_width(e_pad, 1024) == train_width
    assert v2mod._EVAL_BUDGET is None
    try:
        with v2mod.stream_budget(123):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert v2mod._EVAL_BUDGET is None
