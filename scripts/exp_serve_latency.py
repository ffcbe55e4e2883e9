"""On-chip serving latency: UltraPredictor.predict_tails with real
ultra_3g weights on the FB15k-237-shaped graph (v2 kernels). Reports warm
per-request latency percentiles at batch sizes 1 and 8."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

V, E_DIRECT, R_DIRECT = 14541, 272115, 237


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.serve import UltraPredictor
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
    rel_graph = attach_plans(rel_graph, rb=128, chunk=128, host_edges=(
        np.pad(rel_ei, ((0, 0), (0, rel_e_pad - rel_ei.shape[1]))),
        np.pad(rel_et, (0, rel_e_pad - rel_et.shape[0])),
        np.pad(np.ones(rel_et.shape[0], np.float32),
               (0, rel_e_pad - rel_et.shape[0])),
    ))
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT,
                       pad_to=e_pad, relation_graph=rel_graph)
    graph = attach_plans(graph, rb=384, chunk=128, host_edges=(
        np.pad(ei, ((0, 0), (0, e_pad - e))),
        np.pad(et, (0, e_pad - e)),
        np.pad(np.ones(e, np.float32), (0, e_pad - e)),
    ))
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))

    rng = np.random.default_rng(0)
    for bs in (1, 8):
        t0 = time.perf_counter()
        pred = UltraPredictor(params, UltraConfig(), graph, batch_size=bs)
        log(f"bs={bs}: init (rel cache + jit warm) {time.perf_counter()-t0:.1f}s")
        lat = []
        for _ in range(20):
            h = rng.integers(0, V, size=bs)
            r = rng.integers(0, 2 * R_DIRECT, size=bs)
            t0 = time.perf_counter()
            scores, tails = pred.predict_tails(h, r, k=10)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        log(f"bs={bs}: p50 {lat[10]:.0f} ms  p90 {lat[17]:.0f} ms  "
            f"min {lat[0]:.0f} ms per request ({bs} queries)")


if __name__ == "__main__":
    main()
