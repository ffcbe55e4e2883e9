"""rspmm kernel tests: all 6 (sum x mul) variants, forward + gradients,
against a brute-force dense oracle, plus padding/masking invariance.

Mirrors the reference's correctness contract (rspmm.cpp:50-75): the CPU/CUDA
kernel pair was the reference's de-facto oracle; here the dense numpy loop is.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.ops.rspmm import generalized_rspmm

SUMS = ["add", "min", "max"]
MULS = ["mul", "add"]
BACKENDS = ["xla", "xla_chunked"]


def dense_oracle(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op):
    """O(E) python-loop oracle with explicit identity elements."""
    feat = x.shape[1:]
    ident = {"add": 0.0, "min": np.inf, "max": -np.inf}[sum_op]
    out = np.full((num_nodes,) + feat, ident, dtype=np.float64)
    for e in range(edge_index.shape[1]):
        w = edge_weight[e]
        if w == 0.0:
            continue
        dst, src = edge_index[0, e], edge_index[1, e]
        r = relation[edge_type[e]]
        msg = r * x[src] if mul_op == "mul" else r + x[src]
        msg = w * msg
        if sum_op == "add":
            out[dst] += msg
        elif sum_op == "min":
            out[dst] = np.minimum(out[dst], msg)
        else:
            out[dst] = np.maximum(out[dst], msg)
    return out


def random_graph(rng, num_nodes=13, num_rel=5, num_edges=67, feat=(3, 4), weighted=True):
    edge_index = rng.integers(0, num_nodes, size=(2, num_edges)).astype(np.int32)
    edge_type = rng.integers(0, num_rel, size=num_edges).astype(np.int32)
    if weighted:
        edge_weight = rng.uniform(0.5, 2.0, size=num_edges).astype(np.float32)
        edge_weight[rng.uniform(size=num_edges) < 0.2] = 0.0  # some masked edges
    else:
        edge_weight = np.ones(num_edges, dtype=np.float32)
    relation = rng.normal(size=(num_rel,) + feat).astype(np.float32)
    x = rng.normal(size=(num_nodes,) + feat).astype(np.float32)
    return edge_index, edge_type, edge_weight, relation, x


@pytest.mark.parametrize("sum_op", SUMS)
@pytest.mark.parametrize("mul_op", MULS)
@pytest.mark.parametrize("backend", BACKENDS)
def test_forward_matches_oracle(rng, sum_op, mul_op, backend):
    ei, et, ew, rel, x = random_graph(rng)
    out = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), jnp.asarray(rel), jnp.asarray(x),
        sum=sum_op, mul=mul_op, backend=backend, chunk=16,
    )
    expect = dense_oracle(ei, et, ew, rel, x, x.shape[0], sum_op, mul_op)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sum_op", SUMS)
@pytest.mark.parametrize("mul_op", MULS)
def test_padding_invariance(rng, sum_op, mul_op):
    """Appending weight-0 edges must not change the result."""
    ei, et, ew, rel, x = random_graph(rng, weighted=False)
    out = generalized_rspmm(
        jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), jnp.asarray(rel), jnp.asarray(x),
        sum=sum_op, mul=mul_op, backend="xla",
    )
    pad = 33
    ei_p = np.concatenate([ei, np.zeros((2, pad), np.int32)], axis=1)
    et_p = np.concatenate([et, np.zeros(pad, np.int32)])
    ew_p = np.concatenate([ew, np.zeros(pad, np.float32)])
    out_p = generalized_rspmm(
        jnp.asarray(ei_p), jnp.asarray(et_p), jnp.asarray(ew_p), jnp.asarray(rel), jnp.asarray(x),
        sum=sum_op, mul=mul_op, backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=1e-6)


@pytest.mark.parametrize("sum_op", SUMS)
@pytest.mark.parametrize("mul_op", MULS)
@pytest.mark.parametrize("backend", BACKENDS)
def test_gradients(rng, sum_op, mul_op, backend):
    """Compare custom VJP against autodiff of the dense formulation."""
    ei, et, ew, rel, x = random_graph(rng, num_nodes=9, num_rel=4, num_edges=31, feat=(2,))
    ei_j, et_j, ew_j = jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew)

    def loss_kernel(rel, x):
        out = generalized_rspmm(
            ei_j, et_j, ew_j, rel, x, sum=sum_op, mul=mul_op, backend=backend, chunk=8
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)  # ignore empty-row identities
        return jnp.sum(jnp.sin(out))

    def loss_dense(rel, x):
        # dense autodiff reference: one-hot everything
        w = ew_j
        msg = rel[et_j] * x[ei_j[1]] if mul_op == "mul" else rel[et_j] + x[ei_j[1]]
        msg = msg * w[:, None]
        onehot = jax.nn.one_hot(ei_j[0], x.shape[0], axis=0)  # (V, E)
        live = (w != 0.0).astype(msg.dtype)
        if sum_op == "add":
            # NB: einsum/dot would run at bf16-class precision by default on
            # XLA; use an exact broadcast-sum for the oracle.
            out = ((onehot * live[None, :])[:, :, None] * msg[None]).sum(axis=1)
        else:
            big = jnp.inf if sum_op == "min" else -jnp.inf
            sel = jnp.where((onehot * live[None, :])[:, :, None] > 0, msg[None], big)
            out = sel.min(axis=1) if sum_op == "min" else sel.max(axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1))(rel_j, x_j)
    g_dense = jax.grad(loss_dense, argnums=(0, 1))(rel_j, x_j)
    for a, b in zip(g_kernel, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_backend_agreement_large(rng):
    ei, et, ew, rel, x = random_graph(rng, num_nodes=200, num_rel=12, num_edges=5000, feat=(8,))
    args = [jnp.asarray(a) for a in (ei, et, ew, rel, x)]
    out1 = generalized_rspmm(*args, sum="add", mul="mul", backend="xla")
    out2 = generalized_rspmm(*args, sum="add", mul="mul", backend="xla_chunked", chunk=512)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sum_op", SUMS)
@pytest.mark.parametrize("mul_op", MULS)
@pytest.mark.parametrize("backend", BACKENDS)
def test_weight_gradients(rng, sum_op, mul_op, backend):
    """d/d edge_weight against dense autodiff (reference weight_grad,
    rspmm.cpp:106-114)."""
    ei, et, ew, rel, x = random_graph(rng, num_nodes=9, num_rel=4, num_edges=31, feat=(2,))
    ei_j, et_j = jnp.asarray(ei), jnp.asarray(et)
    rel_j, x_j = jnp.asarray(rel), jnp.asarray(x)

    def loss_kernel(w):
        out = generalized_rspmm(
            ei_j, et_j, w, rel_j, x_j, sum=sum_op, mul=mul_op, backend=backend, chunk=8
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    def loss_dense(w):
        msg = rel_j[et_j] * x_j[ei_j[1]] if mul_op == "mul" else rel_j[et_j] + x_j[ei_j[1]]
        msg = msg * w[:, None]
        onehot = jax.nn.one_hot(ei_j[0], x_j.shape[0], axis=0)  # (V, E)
        live = (w != 0.0).astype(msg.dtype)
        if sum_op == "add":
            out = ((onehot * live[None, :])[:, :, None] * msg[None]).sum(axis=1)
        else:
            big = jnp.inf if sum_op == "min" else -jnp.inf
            sel = jnp.where((onehot * live[None, :])[:, :, None] > 0, msg[None], big)
            out = sel.min(axis=1) if sum_op == "min" else sel.max(axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return jnp.sum(jnp.sin(out))

    ew_j = jnp.asarray(ew)
    g_kernel = jax.grad(loss_kernel)(ew_j)
    g_dense = jax.grad(loss_dense)(ew_j)
    # dense autodiff puts no gradient on masked (w==0) edges via the `live`
    # stop; the kernel's d_w is the true derivative, nonzero there for add —
    # compare on live edges only (the defined-by-both subset)
    live = ew != 0.0
    np.testing.assert_allclose(
        np.asarray(g_kernel)[live], np.asarray(g_dense)[live], rtol=1e-4, atol=1e-5
    )
