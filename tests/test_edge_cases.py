"""Degenerate-input hardening: empty graphs, fully masked edges, single
edges, self-loops, duplicate edges — both XLA and Pallas(interpret) paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.graph import make_graph
from ultra_tpu.ops.rspmm import generalized_rspmm, rspmm_from_graph
from ultra_tpu.ops.rspmm_pallas import attach_plans


def as_graph(ei, et, ew, v, r, pad_to=None, plans=False):
    g = make_graph(ei, et, num_nodes=v, num_relations=r, edge_weight=ew, pad_to=pad_to)
    if plans:
        g = attach_plans(g, rb=8, chunk=128)
    return g


def test_all_edges_masked():
    rng = np.random.default_rng(0)
    ei = rng.integers(0, 10, size=(2, 20)).astype(np.int64)
    et = rng.integers(0, 3, size=20).astype(np.int64)
    ew = np.zeros(20, np.float32)
    rel = jnp.asarray(rng.normal(size=(3, 1, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(10, 1, 8)).astype(np.float32))

    out = generalized_rspmm(jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
                            rel, x, sum="add", mul="mul", backend="xla")
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    out = generalized_rspmm(jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
                            rel, x, sum="max", mul="mul", backend="xla")
    assert np.all(np.isneginf(np.asarray(out)))

    g = as_graph(ei, et, ew, 10, 3, pad_to=128, plans=True)
    # plan built from live edges only -> zero chunks; forward must still work
    out_p = rspmm_from_graph(g, rel, x)
    np.testing.assert_allclose(np.asarray(out_p), 0.0)


def test_single_edge_and_self_loop():
    ei = np.array([[2, 4], [3, 4]])  # one normal edge + one self loop
    et = np.array([0, 1])
    ew = np.ones(2, np.float32)
    rel = jnp.asarray(np.ones((2, 1, 8), np.float32) * np.array([2.0, 5.0])[:, None, None])
    x = jnp.asarray(np.ones((6, 1, 8), np.float32))

    for plans in (False, True):
        g = as_graph(ei, et, ew, 6, 2, pad_to=128, plans=plans)
        out = np.asarray(rspmm_from_graph(g, rel, x))
        np.testing.assert_allclose(out[2], 2.0)  # rel0 * x[3]
        np.testing.assert_allclose(out[4], 5.0)  # rel1 * x[4] self loop
        np.testing.assert_allclose(out[[0, 1, 3, 5]], 0.0)


def test_duplicate_edges_accumulate():
    ei = np.array([[1, 1, 1], [0, 0, 0]])
    et = np.array([0, 0, 0])
    ew = np.ones(3, np.float32)
    rel = jnp.asarray(np.full((1, 1, 8), 2.0, np.float32))
    x = jnp.asarray(np.full((3, 1, 8), 3.0, np.float32))
    for plans in (False, True):
        g = as_graph(ei, et, ew, 3, 1, pad_to=128, plans=plans)
        out = np.asarray(rspmm_from_graph(g, rel, x))
        np.testing.assert_allclose(out[1], 18.0)  # 3 copies of 2*3


def test_hub_row_spanning_many_chunks():
    """One dst row with more edges than a chunk: partial sums across chunk
    revisits must accumulate exactly (and max must combine correctly)."""
    rng = np.random.default_rng(1)
    e = 700  # > 5 chunks of 128
    ei = np.stack([np.zeros(e, np.int64), rng.integers(0, 50, size=e)])
    et = rng.integers(0, 4, size=e)
    ew = np.ones(e, np.float32)
    rel = jnp.asarray(rng.normal(size=(4, 1, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(50, 1, 8)).astype(np.float32))

    ref = generalized_rspmm(jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
                            rel, x, sum="add", mul="mul", backend="xla")
    g = as_graph(ei, et, ew, 50, 4, pad_to=1024, plans=True)
    out = rspmm_from_graph(g, rel, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    ref = generalized_rspmm(jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew),
                            rel, x, sum="max", mul="mul", backend="xla")
    out = rspmm_from_graph(g, rel, x, sum="max")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_batchless_feature_shapes():
    """(V, D) features without a batch axis work through the generalized op."""
    rng = np.random.default_rng(2)
    ei = rng.integers(0, 8, size=(2, 30)).astype(np.int64)
    et = rng.integers(0, 3, size=30).astype(np.int64)
    rel = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    out = generalized_rspmm(jnp.asarray(ei), jnp.asarray(et),
                            jnp.ones(30), rel, x, sum="add", mul="add")
    assert out.shape == (8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_fuzz_plans_vs_xla():
    """Randomized graphs x plan configs x ops against the XLA backend."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        v = int(rng.integers(5, 120))
        r = int(rng.integers(1, 12))
        e = int(rng.integers(1, 400))
        b = int(rng.choice([1, 2, 4]))
        d = int(rng.choice([8, 16]))
        rb = int(rng.choice([8, 16, 32, 64]))
        ei = rng.integers(0, v, size=(2, e)).astype(np.int64)
        et = rng.integers(0, r, size=e).astype(np.int64)
        ew = rng.choice([0.0, 1.0, 0.5], size=e, p=[0.2, 0.6, 0.2]).astype(np.float32)
        rel = jnp.asarray(rng.normal(size=(r, b, d)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(v, b, d)).astype(np.float32))
        pad = int(-(-e // 128) * 128)
        g = as_graph(ei, et, ew, v, r, pad_to=pad, plans=False)
        g = attach_plans(g, rb=rb, chunk=128)
        for op in ("add", "max", "min"):
            mul = "mul" if trial % 2 == 0 else "add"
            ref = generalized_rspmm(
                jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel, x,
                sum=op, mul=mul, backend="xla",
            )
            out = rspmm_from_graph(g, rel, x, sum=op, mul=mul)
            a = np.nan_to_num(np.asarray(out), posinf=9e9, neginf=-9e9)
            b_ = np.nan_to_num(np.asarray(ref), posinf=9e9, neginf=-9e9)
            np.testing.assert_allclose(
                a, b_, rtol=3e-3, atol=3e-3,
                err_msg=f"trial={trial} v={v} e={e} rb={rb} op={op} mul={mul}",
            )


def test_minmax_gradient_with_isolated_nodes():
    """Nodes that never appear as a source must get zero d_x even though
    their src-plan output block is never visited by the grid."""
    import jax

    # all edges originate from nodes 0..7; nodes 8..39 are isolated sources
    rng = np.random.default_rng(3)
    e = 60
    ei = np.stack([rng.integers(0, 40, size=e), rng.integers(0, 8, size=e)])
    et = rng.integers(0, 3, size=e)
    ew = np.ones(e, np.float32)
    rel = jnp.asarray(rng.normal(size=(3, 1, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(40, 1, 8)).astype(np.float32))
    g = as_graph(ei, et, ew, 40, 3, pad_to=128, plans=True)

    def loss(rel, x):
        out = rspmm_from_graph(g, rel, x, sum="max")
        return jnp.sum(jnp.sin(jnp.where(jnp.isfinite(out), out, 0.0)))

    gr, gx = jax.grad(loss, argnums=(0, 1))(rel, x)
    gx = np.asarray(gx)
    assert np.isfinite(gx).all()
    np.testing.assert_array_equal(gx[8:], 0.0)

    def loss_ref(rel, x):
        out = generalized_rspmm(
            jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), rel, x,
            sum="max", mul="mul", backend="xla",
        )
        return jnp.sum(jnp.sin(jnp.where(jnp.isfinite(out), out, 0.0)))

    gr2, gx2 = jax.grad(loss_ref, argnums=(0, 1))(rel, x)
    np.testing.assert_allclose(gx, np.asarray(gx2), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr2), rtol=3e-3, atol=3e-3)
