"""Variadic ops vs per-set numpy loops."""

import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.ops import variadic as V


@pytest.fixture
def ragged(rng):
    sizes = np.array([3, 1, 5, 2, 4])
    vals = rng.normal(size=sizes.sum()).astype(np.float32)
    return vals, sizes


def groups(vals, sizes):
    out, pos = [], 0
    for s in sizes:
        out.append(vals[pos : pos + s])
        pos += s
    return out


def test_reductions(ragged):
    vals, sizes = ragged
    gs = groups(vals, sizes)
    np.testing.assert_allclose(V.variadic_sum(jnp.asarray(vals), jnp.asarray(sizes)),
                               [g.sum() for g in gs], rtol=1e-6)
    np.testing.assert_allclose(V.variadic_mean(jnp.asarray(vals), jnp.asarray(sizes)),
                               [g.mean() for g in gs], rtol=1e-6)
    np.testing.assert_allclose(V.variadic_max(jnp.asarray(vals), jnp.asarray(sizes)),
                               [g.max() for g in gs], rtol=1e-6)
    np.testing.assert_allclose(V.variadic_min(jnp.asarray(vals), jnp.asarray(sizes)),
                               [g.min() for g in gs], rtol=1e-6)


def test_softmax_and_log_softmax(ragged):
    vals, sizes = ragged
    gs = groups(vals, sizes)
    sm = np.asarray(V.variadic_softmax(jnp.asarray(vals), jnp.asarray(sizes)))
    expect = np.concatenate([np.exp(g - g.max()) / np.exp(g - g.max()).sum() for g in gs])
    np.testing.assert_allclose(sm, expect, rtol=1e-5)
    lsm = np.asarray(V.variadic_log_softmax(jnp.asarray(vals), jnp.asarray(sizes)))
    np.testing.assert_allclose(np.exp(lsm), expect, rtol=1e-5)


def test_cross_entropy(ragged):
    vals, sizes = ragged
    gs = groups(vals, sizes)
    tgt = np.array([g.argmax() for g in gs])
    ce = np.asarray(V.variadic_cross_entropy(jnp.asarray(vals), jnp.asarray(tgt), jnp.asarray(sizes)))
    expect = [-np.log(np.exp(g - g.max())[t] / np.exp(g - g.max()).sum()) for g, t in zip(gs, tgt)]
    np.testing.assert_allclose(ce, expect, rtol=1e-5)


def test_sort_topk_arange(ragged):
    vals, sizes = ragged
    gs = groups(vals, sizes)
    sv, so = V.variadic_sort(jnp.asarray(vals), jnp.asarray(sizes), descending=True)
    np.testing.assert_allclose(np.asarray(sv), np.concatenate([np.sort(g)[::-1] for g in gs]), rtol=1e-6)
    tv, ti = V.variadic_topk(jnp.asarray(vals), jnp.asarray(sizes), k=3)
    for i, g in enumerate(gs):
        expect = np.sort(g)[::-1][:3]
        if len(expect) < 3:
            expect = np.concatenate([expect, np.repeat(expect[-1:], 3 - len(expect))])
        np.testing.assert_allclose(np.asarray(tv)[i], expect, rtol=1e-6)
    ar = np.asarray(V.variadic_arange(jnp.asarray(sizes)))
    np.testing.assert_array_equal(ar, np.concatenate([np.arange(s) for s in sizes]))


def test_multi_slice_mask_and_extend(ragged):
    vals, sizes = ragged
    m = np.asarray(V.multi_slice_mask(jnp.asarray([1, 6]), jnp.asarray([3, 9]), 10))
    expect = np.zeros(10, bool); expect[1:3] = True; expect[6:9] = True
    np.testing.assert_array_equal(m, expect)

    a = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    b = jnp.asarray(np.array([10.0, 20.0, 30.0]))
    out, ns = V.variadic_extend(a, jnp.asarray([2, 1]), b, jnp.asarray([1, 2]))
    np.testing.assert_allclose(np.asarray(out), [1, 2, 10, 3, 20, 30])
    np.testing.assert_array_equal(np.asarray(ns), [3, 3])


def test_masked_mean_nan():
    v = jnp.asarray(np.array([1.0, np.nan, 3.0]))
    assert float(V.mean_with_nan(v)) == 2.0
