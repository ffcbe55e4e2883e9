"""Decompose the e2e filtered-eval cost at FB scale (round-5 item #3):
where do the ~11 ms/triple go?

Components timed separately (B=8, group=8, cached relations):
  a) device scoring+ranking only: chained score_and_rank_group_cached with
     constant pre-uploaded masks (no host work, no uploads in the loop)
  b) host mask building only: strict_negative_mask over the same batches
  c) mask upload only: jnp.asarray + block of the (G,B,V) mask stacks
  d) the real collect_rankings loop (pipelined host+device)
If d ≈ a + b + c the pipeline is NOT overlapping; if d ≈ max(a, b+c) it
is. The gap guides the next lever (bit-packed masks / more pipelining).
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
N_TRIPS = 1024
B, G = 8, 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.eval import (
        collect_rankings,
        precompute_relation_representations,
        score_and_rank_group_cached,
    )
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}")
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                             rel_dist="zipf", categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    e = ei.shape[1]
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
                       pad_to=pad_bucket(e, 8192), relation_graph=rel_graph)
    graph = attach_plans(graph, v2_sort_slots=True)
    cfg = UltraConfig()
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
    rng = np.random.default_rng(1)
    trips = np.stack([trip[:, 0], trip[:, 1], trip[:, 2]], axis=1)
    trips = trips[rng.choice(len(trips), size=N_TRIPS, replace=False)]

    rel_reprs = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_reprs)

    n_groups = N_TRIPS // (B * G)

    # --- b) host mask building ------------------------------------------
    t0 = time.perf_counter()
    all_masks = []
    for s in range(0, N_TRIPS, B):
        all_masks.append(tasks.strict_negative_mask(index, trips[s:s + B]))
    tb = time.perf_counter() - t0
    log(f"b) host strict_negative_mask: {tb:.2f}s "
        f"({tb / N_TRIPS * 1e3:.2f} ms/triple)")

    # --- c) mask upload --------------------------------------------------
    tms = np.stack([m[0] for m in all_masks]).reshape(n_groups, G, B, V)
    hms = np.stack([m[1] for m in all_masks]).reshape(n_groups, G, B, V)
    bts = np.stack([trips[s:s + B] for s in range(0, N_TRIPS, B)]).reshape(
        n_groups, G, B, 3)
    t0 = time.perf_counter()
    dev = []
    for gi in range(n_groups):
        dev.append((jnp.asarray(bts[gi]), jnp.asarray(tms[gi]),
                    jnp.asarray(hms[gi])))
    jax.block_until_ready(dev)
    tc = time.perf_counter() - t0
    mb = (tms.nbytes + hms.nbytes) / 1e6
    log(f"c) mask+batch upload ({mb:.0f} MB): {tc:.2f}s "
        f"({tc / N_TRIPS * 1e3:.2f} ms/triple, "
        f"{mb / max(tc, 1e-9):.0f} MB/s)")

    # --- a) device-only scoring/ranking ---------------------------------
    from ultra_tpu.ops import rspmm_pallas_v2 as v2mod

    d0 = dev[0]
    jax.block_until_ready(score_and_rank_group_cached(
        params, cfg, graph, rel_reprs, *d0,
        eval_budget=v2mod.EVAL_SLICE_BYTES))  # compile
    t0 = time.perf_counter()
    for gi in range(n_groups):
        out = score_and_rank_group_cached(
            params, cfg, graph, rel_reprs, *dev[gi],
            eval_budget=v2mod.EVAL_SLICE_BYTES)
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    log(f"a) device scoring+ranking (pre-uploaded): {ta:.2f}s "
        f"({ta / N_TRIPS * 1e3:.2f} ms/triple)")

    # --- d) the real pipelined loop --------------------------------------
    collect_rankings(params, cfg, graph, trips[: B * G], index,
                     batch_size=B, cache_relations=True, dispatch_group=G)
    t0 = time.perf_counter()
    collect_rankings(params, cfg, graph, trips, index,
                     batch_size=B, cache_relations=True, dispatch_group=G)
    td = time.perf_counter() - t0
    log(f"d) collect_rankings e2e: {td:.2f}s "
        f"({td / N_TRIPS * 1e3:.2f} ms/triple)")
    log(f"sum a+b+c = {ta + tb + tc:.2f}s vs d = {td:.2f}s "
        f"(overlap recovers {(ta + tb + tc) - td:.2f}s)")


if __name__ == "__main__":
    main()
