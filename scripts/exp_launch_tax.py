"""Re-measure the tunneled chip's per-launch tax on the REAL eval scorer.

Round-2 measured ~0.35 s of fixed cost per executable launch (630 ms synced
single-launch vs 267 ms/iter chained for a 32-triple eval batch) and the
eval loop grew scan-grouping + a one-group pipeline to amortize it. The
round-4 microbench (exp_launch_cost.py) now shows only ~25 ms/launch on
trivial programs regardless of handle count / buffer bytes / async depth —
the backend infra improved during the round-3 outage. This probe checks the
real workload:

  A. chained fori steady state (device floor, one launch)
  B. synced single-launch, all inputs device-resident
  C. synced single-launch incl. host mask build + upload (serve-like)
  D. scan-grouped launch (train/eval.py dispatch_group=8), synced

Launch tax = B - A. If it collapsed, the launch-bound caveats on e2e eval
and serving are stale and scored-q/s should be re-reported.

Run: python scripts/exp_launch_tax.py   (chip; one TPU process at a time)
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
BS = 32
ITERS = 6
GROUP = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.eval import (
        precompute_relation_representations,
        score_and_rank_batch_cached,
        score_and_rank_group_cached,
    )
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}")
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
    e_pad = pad_bucket(e, 8192)
    rel_ei, rel_et = tasks.build_relation_graph_arrays(ei, et, V, 2 * R_DIRECT)
    rel_e_pad = pad_bucket(rel_ei.shape[1], 1024)
    rel_graph = make_graph(rel_ei, rel_et, num_nodes=2 * R_DIRECT,
                           num_relations=4, pad_to=rel_e_pad)
    rel_graph = attach_plans(
        rel_graph, rb=128, chunk=128,
        host_edges=(
            np.pad(rel_ei, ((0, 0), (0, rel_e_pad - rel_ei.shape[1]))),
            np.pad(rel_et, (0, rel_e_pad - rel_et.shape[0])),
            np.pad(np.ones(rel_et.shape[0], np.float32),
                   (0, rel_e_pad - rel_et.shape[0])),
        ),
    )
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                       pad_to=e_pad, relation_graph=rel_graph)
    graph = attach_plans(
        graph, rb=384, chunk=128,
        host_edges=(
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e)),
        ),
    )
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    cfg = UltraConfig()
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)

    rng = np.random.default_rng(0)
    n_direct = e // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    batch = triples[rng.choice(n_direct, size=BS, replace=False)]
    t_mask, h_mask = tasks.strict_negative_mask(index, batch)
    bj = jnp.asarray(batch)
    tm, hm = jnp.asarray(t_mask), jnp.asarray(h_mask)
    jax.block_until_ready((bj, tm, hm))

    rel_all = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_all)

    # -- A: chained device floor ------------------------------------------
    def step(c):
        rel_c = rel_all + c.astype(rel_all.dtype) * 1e-30
        t_rank, h_rank = score_and_rank_batch_cached(
            params, cfg, graph, rel_c, bj, tm, hm
        )
        return c + jnp.sum(t_rank) + jnp.sum(h_rank)

    c1 = jax.jit(lambda c: jax.lax.fori_loop(0, 1, lambda i, cc: step(cc), c))
    cn = jax.jit(lambda c: jax.lax.fori_loop(0, ITERS, lambda i, cc: step(cc), c))
    z = jnp.zeros((), jnp.float32)
    float(c1(z)); float(cn(z))
    chained = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(z)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(cn(z)); tn = time.perf_counter() - t0
        chained = min(chained, (tn - t1) / (ITERS - 1) * 1e3)
    log(f"A chained steady-state: {chained:.0f} ms/batch "
        f"({BS / (chained * 1e-3):.0f} scored q/s device-side)")

    # -- B: synced single launch, device-resident inputs -------------------
    def synced_once():
        t_rank, h_rank = score_and_rank_batch_cached(
            params, cfg, graph, rel_all, bj, tm, hm
        )
        return float(jnp.sum(t_rank) + jnp.sum(h_rank))

    synced_once(); synced_once()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); synced_once()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    single = ts[len(ts) // 2] * 1e3
    log(f"B synced single-launch: {single:.0f} ms/batch "
        f"(launch tax vs A: {single - chained:.0f} ms)")

    # -- C: synced incl. host mask build + upload (serve-like) -------------
    def serve_once():
        b = triples[rng.choice(n_direct, size=BS, replace=False)]
        t_m, h_m = tasks.strict_negative_mask(index, b)
        t_rank, h_rank = score_and_rank_batch_cached(
            params, cfg, graph, rel_all,
            jnp.asarray(b), jnp.asarray(t_m), jnp.asarray(h_m),
        )
        return float(jnp.sum(t_rank) + jnp.sum(h_rank))

    serve_once()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); serve_once()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    log(f"C synced + host masks + upload: {ts[len(ts) // 2] * 1e3:.0f} ms/batch")

    # -- D: scan-grouped launch (GROUP batches), synced --------------------
    batches = jnp.asarray(np.stack([batch] * GROUP))
    tms = jnp.asarray(np.stack([t_mask] * GROUP))
    hms = jnp.asarray(np.stack([h_mask] * GROUP))
    jax.block_until_ready((batches, tms, hms))

    def group_once():
        t_rank, h_rank = score_and_rank_group_cached(
            params, cfg, graph, rel_all, batches, tms, hms
        )
        return float(jnp.sum(t_rank) + jnp.sum(h_rank))

    group_once(); group_once()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); group_once()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    grouped = ts[len(ts) // 2] * 1e3 / GROUP
    log(f"D scan-grouped ({GROUP}/launch) synced: {grouped:.0f} ms/batch")


if __name__ == "__main__":
    main()
