"""End-to-end HTTP serving latency on chip: FB15k-237-shaped graph, real
ultra_3g weights, the shipped PredictionService behind ThreadingHTTPServer,
measured through real sockets (results are host-fetched numpy, so timings
are true completion times — no async-dispatch mirage).

Reports client-side p50/p90 for bs-1 link prediction, bs-8 batches, and
single CLQA queries, plus the server's own /v1/meta percentiles.
"""

import json
import os
import sys
import threading
import time
from http.client import HTTPConnection

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod
from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.serve import UltraPredictor
from ultra_tpu.server import PredictionService, make_http_server
from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

V, R_DIRECT, E_DIRECT = benchmod.V, benchmod.R_DIRECT, benchmod.E_DIRECT


def _req(addr, method, path, payload=None):
    conn = HTTPConnection(*addr, timeout=300)
    conn.request(method, path, body=json.dumps(payload) if payload else None)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    assert resp.status == 200, out
    return out


def main():
    graph, _ = benchmod.build("realistic")
    graph = graph.replace(
        plans=graph.plans.replace(w3=None, w3src=None, v2rg=None, v2rgsrc=None)
    )
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, rel_dist="zipf",
                             categories=30)
    ei, et = with_inverses(trip, R_DIRECT)
    graph = benchmod.attach_fb_relgraph(graph, ei, et)
    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    predictor = UltraPredictor(params, UltraConfig(), graph, batch_size=8)
    service = PredictionService(predictor)
    httpd = make_http_server(service, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    addr = httpd.server_address
    print(f"serving FB-shaped graph on {addr}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)

    def lat(fn, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2], ts[int(0.9 * (len(ts) - 1))]

    one = lambda: _req(addr, "POST", "/v1/predict", {"queries": [  # noqa: E731
        {"head": int(rng.integers(V)), "relation": int(rng.integers(R_DIRECT)),
         "k": 10}]})
    eight = lambda: _req(addr, "POST", "/v1/predict", {"queries": [  # noqa: E731
        {"head": int(rng.integers(V)), "relation": int(rng.integers(R_DIRECT)),
         "k": 10} for _ in range(8)]})
    q2i = lambda: _req(addr, "POST", "/v1/query", {"queries": [  # noqa: E731
        [[int(rng.integers(V)), [int(rng.integers(2 * R_DIRECT))]],
         [int(rng.integers(V)), [int(rng.integers(2 * R_DIRECT))]]]], "k": 10})

    one(); eight(); q2i()  # compile warm-up
    p50_1, p90_1 = lat(one, 30)
    p50_8, p90_8 = lat(eight, 20)
    p50_q, p90_q = lat(q2i, 15)
    meta = _req(addr, "GET", "/v1/meta")
    print(f"HTTP predict bs=1: p50 {p50_1:.0f} ms p90 {p90_1:.0f} ms")
    print(f"HTTP predict bs=8: p50 {p50_8:.0f} ms p90 {p90_8:.0f} ms "
          f"({p50_8 / 8:.1f} ms/query)")
    print(f"HTTP CLQA 2i bs=1: p50 {p50_q:.0f} ms p90 {p90_q:.0f} ms")
    print(f"server meta: {meta['latency_ms']} over {meta['requests']} requests")
    httpd.shutdown()


if __name__ == "__main__":
    main()
