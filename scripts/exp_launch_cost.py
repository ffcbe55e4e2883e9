"""Probe: what does the tunneled chip's per-launch fixed cost scale with?

Round-2/3 observation (CLAUDE.md, train/eval.py): ~0.35-0.4 s per
executable launch, apparently scaling with the ~150 param/graph/plan input
buffer handles rather than with compute, and NOT removed by pre-uploading
inputs. If the cost is per-HANDLE (RPC arg marshaling in the axon client),
then packing the pytree into a few flat device blobs and unpacking inside
jit should collapse it — that is the design decision this probe gates.

Configs, all device-resident inputs, trivial compute (sum of first element
of each buffer -> scalar):
  A. n_bufs separate (16, 1024) f32 arrays, n in {1, 8, 32, 128, 256}
  B. one packed (n*16, 1024) array + static in-jit slices (same math)
  C. output-side: return n arrays vs 1 (d2h handle cost)
  D. async pipelining: dispatch 16 launches back-to-back, block at end
     (does the tunnel pipeline in-flight executes?)

Run: python scripts/exp_launch_cost.py   (chip; one TPU process at a time)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, args, reps=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        # force a real host round-trip (block_until_ready alone can lie
        # on this backend)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[0]))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    print("devices:", jax.devices())
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)

    print("\n-- A: input handle count (device-resident, same compute) --")
    for n in (1, 32, 128):
        bufs = [
            jax.device_put(np.full((16, 1024), i + 1, np.float32), dev)
            for i in range(n)
        ]

        @jax.jit
        def f(*xs):
            return sum(x[0, 0] for x in xs)

        t = sync_time(f, bufs)
        print(f"  n_bufs={n:4d}: {t * 1e3:8.1f} ms/launch")

    print("\n-- B: packed single buffer + in-jit slices --")
    for n in (32, 128):
        packed = jax.device_put(
            np.concatenate([np.full((16, 1024), i + 1, np.float32) for i in range(n)]),
            dev,
        )

        @jax.jit
        def g(p):
            return sum(p[16 * i, 0] for i in range(n))

        t = sync_time(g, (packed,))
        print(f"  packed n={n:4d}: {t * 1e3:8.1f} ms/launch")

    print("\n-- C: output handle count (1 input) --")
    x = jax.device_put(np.ones((16, 1024), np.float32), dev)
    for n in (1, 64):

        @jax.jit
        def h(x):
            return tuple(x * (i + 1) for i in range(n))

        t = sync_time(h, (x,))
        print(f"  n_out={n:4d}: {t * 1e3:8.1f} ms/launch")

    print("\n-- D: async pipelining of K launches (128 input handles) --")
    n = 128
    bufs = [
        jax.device_put(np.full((16, 1024), i + 1, np.float32), dev) for i in range(n)
    ]

    @jax.jit
    def f(*xs):
        return sum(x[0, 0] for x in xs)

    # warm
    float(f(*bufs))
    for k in (1, 8):
        t0 = time.perf_counter()
        outs = [f(*bufs) for _ in range(k)]
        for o in outs:
            float(o)
        dt = time.perf_counter() - t0
        print(f"  K={k:3d}: total {dt * 1e3:8.1f} ms  ({dt / k * 1e3:7.1f} ms/launch)")

    print("\n-- E: handle count with LARGE buffers (4 MB each, 32 handles) --")
    for n, shape in ((32, (1024, 1024)), (32, (16, 1024))):
        bufs = [
            jax.device_put(np.full(shape, i + 1, np.float32), dev) for i in range(n)
        ]

        @jax.jit
        def f(*xs):
            return sum(x[0, 0] for x in xs)

        t = sync_time(f, bufs)
        mb = np.prod(shape) * 4 / 1e6
        print(f"  n={n} x {mb:.2f} MB: {t * 1e3:8.1f} ms/launch")


if __name__ == "__main__":
    main()
