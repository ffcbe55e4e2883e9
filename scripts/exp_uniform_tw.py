"""Uniform-histogram table-width probe.

On uniform relation histograms the v2 planner's clustering fails at the
default tw=128 and falls back to one global r_pad(=480)-row table; the
per-chunk one-hot select matmul then costs (C, 480) @ (480, F) ~ 0.77 ms
total vs 0.2 ms at tw=128. Middle widths (192/256/320) may group: per-dst
type-sorted slots give each slot a contiguous type range, and min-type
slot sorting within blocks keeps chunk unions narrow-ish even with no
signature structure. Measures plan stats + fwd slope per tw.
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
ITERS = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(step, x0, n=ITERS, rounds=3):
    f1 = jax.jit(lambda x: jax.lax.fori_loop(0, 1, lambda i, c: step(c), x))
    fn = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))
    best = []
    jax.block_until_ready(f1(x0)); jax.block_until_ready(fn(x0))
    for _ in range(rounds):
        t0 = time.perf_counter(); jax.block_until_ready(f1(x0))
        t0b = time.perf_counter(); jax.block_until_ready(fn(x0))
        tend = time.perf_counter()
        best.append(((tend - t0b) - (t0b - t0)) / (n - 1) * 1e3)
    return min(best)


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))

    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)  # uniform
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    we = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

    widths = tuple(int(w) for w in sys.argv[1:]) or (128, 192, 256, 320, 384)
    for tw in widths:
        p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=1024,
                                tw=tw, edge_ids=np.arange(e), dead_slot=e)
        ms = slope(lambda xx, p=p: 0.999 * xx + 0.001 * v2mod.rspmm_v2_fwd(
            p, rel, xx, we, mul="mul", out_rows=V), x)
        log(f"[uniform] tw_req={tw}: got tw={p.tw} groups={p.n_groups} "
            f"tables={p.n_groups*p.tw} rows ({p.n_groups*p.tw/p.e_pad:.2f} "
            f"of e_pad) | {ms:.2f} ms ({e/(ms*1e-3)/1e6:.0f} M e/s)")




def feasibility_floor():
    """Print the max single-chunk distinct-type count (the narrowest tw
    that can cluster at all) for the uniform bench graph."""
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=1024,
                            tw=480, edge_ids=np.arange(e), dead_slot=e)
    # rebuild the per-chunk live type sets exactly as the planner sees them
    # (global table => type_local holds global padded type ids)
    tl = np.asarray(p.type_local)
    live = np.asarray(p.perm).reshape(tl.shape) != e  # dead_slot == e
    dist = [len(np.unique(tl[k][live[k]])) for k in range(tl.shape[0])]
    log(f"[uniform] per-chunk distinct types: max={max(dist)} "
        f"p99={int(np.percentile(dist, 99))} median={int(np.median(dist))}")


if __name__ == "__main__":
    feasibility_floor()
    main()
# NOTE (round 4): single min-of-3 slope readings from this script can be
# FAST-BIASED (an overlong n=1 run deflates the slope and min() selects
# it — the 3.08 ms/177 M tw=352 reading did not reproduce). Use
# exp_uniform_tw3.py's interleaved medians for decisions.
