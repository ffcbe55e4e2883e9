"""Does XLA fuse the f32->bf16 cast INTO the row gather (reading 2 KB/row
instead of 1 KB)? Compare take(cast(x)) vs take(barrier(cast(x))) vs a
pre-cast input, at the v2 stream shape."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

V, F, E = 14592, 512, 616448
ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(f, x, idx):
    c1 = jax.jit(lambda x, i: jax.lax.fori_loop(
        0, 1, lambda k, c: c + f(x, i)[0, 0].astype(jnp.float32), jnp.zeros(())))
    cn = jax.jit(lambda x, i: jax.lax.fori_loop(
        0, ITERS, lambda k, c: c + f(x, i)[0, 0].astype(jnp.float32), jnp.zeros(())))
    float(c1(x, idx)); float(cn(x, idx))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(x, idx)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(cn(x, idx)); tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / (ITERS - 1) * 1e3)
    return best


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, size=E).astype(np.int32))

    variants = {
        "take(cast(x))": lambda x, i: jnp.take(x.astype(jnp.bfloat16), i, axis=0),
        "take(barrier(cast(x)))": lambda x, i: jnp.take(
            jax.lax.optimization_barrier(x.astype(jnp.bfloat16)), i, axis=0
        ),
        "take(pre-cast x)": lambda x, i: jnp.take(x, i, axis=0),
    }
    for name, f in variants.items():
        xin = xb if "pre-cast" in name else x
        ms = slope(f, xin, idx)
        log(f"{name}: {ms:.2f} ms ({E/(ms*1e-3)/1e6:.0f} M rows/s)")


if __name__ == "__main__":
    main()
