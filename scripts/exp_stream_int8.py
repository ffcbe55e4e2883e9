"""On-chip A/B of the int8 quantized gather stream (ULTRA_V2_STREAM_INT8)
vs the default bf16 stream: v2 sum/mul forward on the realistic and
uniform bench graphs, interleaved medians, plus error vs a f64 dense
oracle for both modes.

The int8 stream halves the gather's HBM write and the kernel's stream
re-read (631 -> 316 MB at bench shape); whether that shows up depends on
how much of the measured 2.0 ms gather is byte-bound vs row-issue-bound
(src_sort showed it is not DRAM-locality-bound).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
B, D = 8, 64
F = B * D
ITERS = 16
ROUNDS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))

    cases = {}
    for kind, kw in (("realistic", dict(rel_dist="zipf", categories=30)),
                     ("uniform", {})):
        trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, **kw)
        ei, et = with_inverses(trip, R_DIRECT)
        e = ei.shape[1]
        we = jnp.concatenate([jnp.ones(e, jnp.float32),
                              jnp.zeros(1, jnp.float32)])
        p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=1024,
                                edge_ids=np.arange(e), dead_slot=e)
        xs = np.asarray(x, np.float64)[ei[1]] * np.asarray(rel, np.float64)[et]
        oracle = np.zeros((V, F))
        np.add.at(oracle, ei[0], xs)

        for mode in ("bf16", "int8"):
            # the flag is read at TRACE time only — set it around plan/step
            # construction and the warmup traces, never inside the step
            # closure (a runtime toggle there would be a silent no-op after
            # retrace/caching)
            v2mod.STREAM_INT8 = mode == "int8"
            out = np.asarray(
                v2mod.rspmm_v2_fwd(p, rel, x, we, mul="mul", out_rows=V),
                np.float64,
            )
            err = float(np.mean(np.abs(out - oracle) / (np.abs(oracle) + 1e-6)))
            step = lambda xx, p=p: (
                0.999 * xx
                + 0.001 * v2mod.rspmm_v2_fwd(p, rel, xx, we, mul="mul",
                                             out_rows=V)
            )
            c1 = jax.jit(lambda z, s=step: jax.lax.fori_loop(
                0, 1, lambda i, c: s(c), z))
            cn = jax.jit(lambda z, s=step: jax.lax.fori_loop(
                0, ITERS, lambda i, c: s(c), z))
            jax.block_until_ready(c1(x)); jax.block_until_ready(cn(x))
            cases[(kind, mode)] = (c1, cn, e, err, [])
        v2mod.STREAM_INT8 = False

    for _ in range(ROUNDS):
        for (kind, mode), (c1, cn, e, err, times) in cases.items():
            t0 = time.perf_counter(); jax.block_until_ready(c1(x))
            t1 = time.perf_counter(); jax.block_until_ready(cn(x))
            t2 = time.perf_counter()
            times.append(((t2 - t1) - (t1 - t0)) / (ITERS - 1) * 1e3)

    for (kind, mode), (_, _, e, err, times) in cases.items():
        med = float(np.median(times))
        log(f"[{kind}] {mode}: median {med:.2f} ms "
            f"({e/(med*1e-3)/1e6:.0f} M e/s) | err vs f64 {err:.2e} | "
            f"rounds {['%.2f' % t for t in times]}")


if __name__ == "__main__":
    main()
