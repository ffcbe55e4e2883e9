"""Full-split filtered-eval wall-clock at FB15k-237 scale on chip
(round-5 item #3): B x dispatch_group sweep through the REAL eval loop
(`train.eval.collect_rankings` — host strict-mask building, one-group
pipelining, cached relation representations, fused t+h scoring).

Reports triples/s end-to-end and the extrapolated full-split time
(FB15k-237 test = 20,438 triples, both directions), which feeds bench.py's
`eval_split_s` field.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237
N_TRIPS = 2048
FB_TEST = 20438


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.eval import collect_rankings, compute_metrics
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

    results = {}
    for bsz, dg in ((8, 8), (16, 8), (32, 8), (8, 16), (16, 4), (32, 4)):
        # warm the jit caches with a tiny run (compile excluded from timing)
        collect_rankings(params, cfg, graph, trips[: bsz * dg], index,
                         batch_size=bsz, cache_relations=True,
                         dispatch_group=dg)
        t0 = time.perf_counter()
        out = collect_rankings(params, cfg, graph, trips, index,
                               batch_size=bsz, cache_relations=True,
                               dispatch_group=dg)
        dt = time.perf_counter() - t0
        m = compute_metrics(("mrr", "hits@10"), *out)
        tps = N_TRIPS / dt
        results[(bsz, dg)] = (dt, tps)
        log(f"B={bsz:>2} group={dg:>2}: {dt:6.1f}s  {tps:6.1f} trips/s "
            f"-> full FB test split {FB_TEST / tps:6.1f}s | "
            f"mrr {m['mrr']:.4f} h10 {m['hits@10']:.4f}")

    # relation-representation precompute cost (amortized over the split)
    from ultra_tpu.train.eval import precompute_relation_representations
    t0 = time.perf_counter()
    jax.block_until_ready(
        precompute_relation_representations(params, cfg, graph))
    log(f"rel-repr precompute (R={2*R_DIRECT}): {time.perf_counter()-t0:.1f}s")

    best = min(results.items(), key=lambda kv: kv[1][0])
    log(f"BEST: B={best[0][0]} group={best[0][1]} "
        f"{best[1][1]:.1f} trips/s, full-split {FB_TEST/best[1][1]:.1f}s")


if __name__ == "__main__":
    main()
