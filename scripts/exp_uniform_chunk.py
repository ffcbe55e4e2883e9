"""Uniform-histogram select-cost probe, round 5 (VERDICT #5): CHUNK SIZE
as a select-width lever.

The uniform case's cost is dominated by the one-hot table select — a
(C, tw) x (tw, F) MXU matmul per chunk whose MAC count scales with tw.
With type-sorted slots the feasibility floor tw ~= max per-chunk distinct
types, which SHRINKS with the chunk size: smaller chunks concentrate the
sorted type range further. This sweeps chunk in {1024, 512, 256} with
auto-escalated tw (plus the chunk=1024 global-table baseline), printing
plan stats (tw, groups, table-row fraction vs TW_ACCEPT) and interleaved
medians for fwd / d_x / d_rel. Trade-off being measured: select MACs
(down with chunk) vs per-chunk grid overhead (up: round-2 measured
chunk=128 paying 2x grid) vs table DMA (gated by TW_ACCEPT).
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


def make_chain(step, n):
    return jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))


def main():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))

    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)  # uniform
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    we = jnp.concatenate([jnp.ones(e, jnp.float32), jnp.zeros(1, jnp.float32)])

    xs = np.asarray(x, np.float64)[ei[1]] * np.asarray(rel, np.float64)[et]
    oracle_fwd = np.zeros((V, F))
    np.add.at(oracle_fwd, ei[0], xs)

    def err(a, o):
        a = np.asarray(a, np.float64)
        return float(np.mean(np.abs(a - o) / (np.abs(o) + 1e-6)))

    cases = {}
    for tag, chunk, kw in (
        ("c1024-auto", 1024, {}),
        ("c512-auto", 512, {}),
        ("c256-auto", 256, {}),
        ("c1024-global", 1024, dict(cluster=False)),
    ):
        p = v2mod.build_plan_v2(ei, et, V, 2 * R_DIRECT, chunk=chunk,
                                edge_ids=np.arange(e), dead_slot=e, **kw)
        ps = v2mod.build_plan_v2(ei[::-1], et, V, 2 * R_DIRECT, chunk=chunk,
                                 edge_ids=np.arange(e), dead_slot=e, **kw)
        fwd = np.asarray(v2mod.rspmm_v2_fwd(p, rel, x, we, mul="mul",
                                            out_rows=V))
        frac = p.n_groups * p.tw / p.e_pad
        log(f"[{tag}] tw={p.tw} groups={p.n_groups} chunks={p.num_chunks} "
            f"e_pad={p.e_pad} table-rows={frac:.3f}*e_pad | "
            f"fwd err vs f64 {err(fwd, oracle_fwd):.2e}")
        steps = {
            "fwd": lambda xx, p=p: 0.999 * xx + 0.001 * v2mod.rspmm_v2_fwd(
                p, rel, xx, we, mul="mul", out_rows=V),
            "d_x": lambda gg, ps=ps: 0.999 * gg + 0.001 * v2mod.rspmm_v2_fwd(
                ps, rel, gg, we, mul="mul", out_rows=V),
            "d_rel": lambda xx, p=p: 0.999 * xx + 1e-30 * jnp.sum(
                v2mod.rspmm_v2_drel(p, xx, g, we, rel.shape[0])),
        }
        for sname, step in steps.items():
            c1, cn = make_chain(step, 1), make_chain(step, ITERS)
            x0 = g if sname == "d_x" else x
            jax.block_until_ready(c1(x0)); jax.block_until_ready(cn(x0))
            cases[(tag, sname)] = (c1, cn, x0, [])

    for _ in range(ROUNDS):
        for (tag, sname), (c1, cn, x0, times) in cases.items():
            t0 = time.perf_counter(); jax.block_until_ready(c1(x0))
            t1 = time.perf_counter(); jax.block_until_ready(cn(x0))
            t2 = time.perf_counter()
            times.append(((t2 - t1) - (t1 - t0)) / (ITERS - 1) * 1e3)

    for (tag, sname), (_, _, _, times) in cases.items():
        med = float(np.median(times))
        log(f"[{tag}] {sname}: median {med:.2f} ms ({e/(med*1e-3)/1e6:.0f} "
            f"M e/s) rounds {['%.2f' % t for t in times]}")


if __name__ == "__main__":
    main()
