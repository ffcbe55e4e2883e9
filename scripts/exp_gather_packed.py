"""Round-3 gather-efficiency A/B: the v2 pipeline's materialized XLA row
gather (stage 1: ~2.0 ms vs 1.54 ms floor at the bench shape) re-timed in
candidate formulations. All candidates produce the identical (E_pad, F)
bf16 stream the fold kernel consumes.

  1. take-bf16      jnp.take(x_bf16, idx, axis=0)            — current
  2. take-packed    bitcast bf16 (V,F) -> f32 (V,F/2), take, bitcast back
                    (same bytes, half the gathered elements — tests
                    whether XLA's gather engine is element-rate-bound)
  3. take-packed64  pack 2 f32 -> 1 via complex64? jnp doesn't gather
                    c64 faster; instead pack to (V, F/4) via
                    bitcast to f32 pairs twice is impossible — skipped.
  4. gather-dyn     lax.gather with explicit dnums (take's underlying op,
                    sanity: should equal 1)
  5. take-f32       gather in f32 then cast to bf16 (2x read bytes of x,
                    but x is tiny; tests conversion placement)

Usage: python scripts/exp_gather_packed.py  (on the TPU)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

V, F = 14541, 512
E = 616448
V_PAD = 14592


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fj, *args, iters=8):
    def chain(n):
        def step(c):
            o = fj(*args)
            return c + jnp.sum(o[:2].astype(jnp.float32)) * 1e-30
        return jax.jit(
            lambda c: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)
        )
    c1, cn = chain(1), chain(iters)
    float(c1(jnp.zeros(()))); float(cn(jnp.zeros(())))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(jnp.zeros(()))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(cn(jnp.zeros(()))); tn = time.perf_counter() - t0
        ms = max(tn - t1, 1e-9) / (iters - 1) * 1e3
        best = ms if best is None else min(best, ms)
    return best


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(V_PAD, F)).astype(np.float32))
    xb = x32.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, size=(E,)).astype(np.int32))
    gb = E * F * 2 / 1e9

    def t_take_bf16(x_, i_):
        return jnp.take(x_, i_, axis=0)

    def t_take_packed(x_, i_):
        xp = jax.lax.bitcast_convert_type(
            x_.reshape(V_PAD, F // 2, 2), jnp.float32
        )                                     # (V, F/2) f32, same bytes
        g = jnp.take(xp, i_, axis=0)          # (E, F/2) f32
        return jax.lax.bitcast_convert_type(g, jnp.bfloat16).reshape(E, F)

    def t_take_f32(x32_, i_):
        return jnp.take(x32_, i_, axis=0).astype(jnp.bfloat16)

    # numerics check once
    a = np.asarray(jax.jit(t_take_bf16)(xb, idx)[:64].astype(jnp.float32))
    b = np.asarray(jax.jit(t_take_packed)(xb, idx)[:64].astype(jnp.float32))
    assert np.array_equal(a, b), "packed gather mismatch"

    for name, f, args in (
        ("take-bf16 (current)", t_take_bf16, (xb, idx)),
        ("take-packed f32xF/2", t_take_packed, (xb, idx)),
        ("take-f32 + cast", t_take_f32, (x32, idx)),
    ):
        try:
            fj = jax.jit(f)
            ms = slope(fj, *args)
            log(f"{name}: {ms:.2f} ms -> {gb/(ms*1e-3):.0f} GB/s stream-write "
                f"({E/(ms*1e-3)/1e6:.0f} M rows/s)")
        except Exception as exc:  # noqa: BLE001
            log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}")


if __name__ == "__main__":
    main()
