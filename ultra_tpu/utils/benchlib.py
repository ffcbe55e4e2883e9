"""Reliable device timing under the tunneled-TPU backend.

The experimental 'axon' PJRT backend's block_until_ready can return before
execution finishes when timing repeated dispatches, and device-to-host
transfers ride a slow tunnel. Robust recipe: chain N iterations *inside* one
jitted scan (data dependency prevents elision/overlap games) and force
completion by pulling a single scalar to host.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_op(op: Callable, carry_init, iters: int = 20, warmup: bool = True) -> float:
    """Seconds per call of ``op(carry) -> carry`` (carry: pytree of arrays).

    ``op`` must return something of the same structure as its input so
    iterations chain. Measures (scan of N iters) - (scan of 1 iter) to cancel
    dispatch/transfer constants, divided by N-1.
    """

    def chain(n):
        @jax.jit
        def run(carry):
            def body(c, _):
                return op(c), ()

            out, _ = jax.lax.scan(body, carry, None, length=n)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l) if jnp.issubdtype(l.dtype, jnp.floating) else 0.0
                       for l in leaves)

        return run

    run_n = chain(iters)
    run_1 = chain(1)
    if warmup:
        float(run_n(carry_init))
        float(run_1(carry_init))

    t0 = time.perf_counter()
    s1 = float(run_1(carry_init))
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    sn = float(run_n(carry_init))
    tn = time.perf_counter() - t0

    return max(tn - t1, 1e-9) / (iters - 1)
