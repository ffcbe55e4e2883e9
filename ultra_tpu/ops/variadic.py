"""Variadic (ragged-set) primitives over a flat value tensor + per-set size
vector — the jnp port of /root/reference/ultra/variadic.py (15 ops).

All ops take ``value`` (flat along axis 0, total = sizes.sum()) and ``size``
(N,) and reduce/transform per set. Built on XLA segment ops with static
``num_segments`` = len(size); usable under jit when sizes are traced but the
flat length is static.

Note: the reference's sort/topk use a numerically fragile "offset by 4x gap
per segment then argsort" trick (variadic.py:276-293, acknowledged fragile
in README.md:503); here sorts are exact two-key lexsorts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def size_to_index(size: Array) -> Array:
    """(N,) sizes -> (total,) set id per element (repeat_interleave)."""
    total = size.sum()
    ends = jnp.cumsum(size)
    return jnp.searchsorted(ends, jnp.arange(total), side="right")


def _starts(size: Array) -> Array:
    return jnp.cumsum(size) - size


def variadic_sum(value: Array, size: Array) -> Array:
    return jax.ops.segment_sum(value, size_to_index(size), num_segments=size.shape[0])


def variadic_mean(value: Array, size: Array) -> Array:
    s = variadic_sum(value, size)
    denom = jnp.maximum(size, 1).astype(s.dtype)
    return s / denom.reshape((-1,) + (1,) * (s.ndim - 1))


def variadic_max(value: Array, size: Array) -> Array:
    return jax.ops.segment_max(value, size_to_index(size), num_segments=size.shape[0])


def variadic_min(value: Array, size: Array) -> Array:
    return jax.ops.segment_min(value, size_to_index(size), num_segments=size.shape[0])


def variadic_arange(size: Array) -> Array:
    """Concatenated [0..s) ranges (variadic.py:343-351)."""
    idx = size_to_index(size)
    return jnp.arange(idx.shape[0]) - _starts(size)[idx]


def variadic_softmax(value: Array, size: Array) -> Array:
    """Per-set softmax (used by the adversarial negative weighting,
    run_query.py:109)."""
    idx = size_to_index(size)
    vmax = variadic_max(value, size)
    shifted = value - vmax[idx]
    e = jnp.exp(shifted)
    denom = variadic_sum(e, size)
    return e / denom[idx]


def variadic_log_softmax(value: Array, size: Array) -> Array:
    idx = size_to_index(size)
    vmax = variadic_max(value, size)
    shifted = value - vmax[idx]
    lse = jnp.log(variadic_sum(jnp.exp(shifted), size))
    return shifted - lse[idx]


def variadic_cross_entropy(pred: Array, target_index: Array, size: Array) -> Array:
    """Per-set cross entropy where target_index is the in-set position of
    the true class (variadic.py:239-263)."""
    logp = variadic_log_softmax(pred, size)
    pos = _starts(size) + target_index
    return -logp[pos]


def variadic_sort(value: Array, size: Array, descending: bool = False) -> Tuple[Array, Array]:
    """Exact per-set sort; returns (sorted values, in-set order indices)."""
    idx = size_to_index(size)
    key = -value if descending else value
    order = jnp.lexsort((key, idx))
    return value[order], order - _starts(size)[idx]


def variadic_topk(value: Array, size: Array, k: int, largest: bool = True):
    """Per-set top-k (padded with each set's boundary value when size < k),
    mirroring variadic.py:296-330's clamp-to-last behavior. Returns
    (values (N, k), in-set indices (N, k))."""
    sorted_vals, in_set = variadic_sort(value, size, descending=largest)
    starts = _starts(size)
    # gather positions start + min(i, size-1) for i in [0, k)
    offs = jnp.minimum(jnp.arange(k)[None, :], jnp.maximum(size[:, None] - 1, 0))
    pos = starts[:, None] + offs
    return sorted_vals[pos], in_set[pos]


def multi_slice_mask(starts: Array, ends: Array, length: int) -> Array:
    """Boolean mask with True on [starts_i, ends_i) (variadic.py:354-363)."""
    values = jnp.concatenate([jnp.ones_like(starts), -jnp.ones_like(ends)])
    slices = jnp.concatenate([starts, ends])
    delta = jax.ops.segment_sum(values, slices, num_segments=length + 1)[:-1]
    return jnp.cumsum(delta) > 0


def masked_mean(value: Array, mask: Array, axis=None) -> Array:
    m = mask.astype(value.dtype)
    return (value * m).sum(axis) / jnp.maximum(m.sum(axis), 1)


def mean_with_nan(value: Array, axis=None) -> Array:
    ok = ~jnp.isnan(value)
    return masked_mean(jnp.nan_to_num(value), ok, axis)


def variadic_extend(a: Array, a_size: Array, b: Array, b_size: Array):
    """Interleave two ragged tensors set-wise: out set i = [a_i .. b_i]
    (variadic.py _extend; used to merge easy/hard answer ranks)."""
    new_size = a_size + b_size
    new_starts = _starts(new_size)
    total = a.shape[0] + b.shape[0]
    out = jnp.zeros((total,) + a.shape[1:], a.dtype)
    a_pos = new_starts[size_to_index(a_size)] + variadic_arange(a_size)
    b_pos = new_starts[size_to_index(b_size)] + a_size[size_to_index(b_size)] + variadic_arange(b_size)
    out = out.at[a_pos].set(a)
    out = out.at[b_pos].set(b)
    return out, new_size
