"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: rspmm edges/sec/chip on an FB15k-237-shaped synthetic graph
(V=14541, 544K edges incl. inverses, 474 relation types, batch 8 x dim 64 —
the reference's transductive eval configuration, batch_size 8 per
config/transductive/inference.yaml).

vs_baseline: ratio against an A100 estimate of the reference CUDA kernel.
The reference publishes no edges/s numbers (SURVEY.md §6); we assume the
memory-bound bound of rspmm.cu on A100-40GB (1555 GB/s): each edge reads a
(B*D)=512-float input row + writes V rows, ~35% efficiency measured for
GE-SpMM-class kernels => ~2.6e8 edges/s. We use 2.5e8 as the baseline.

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import time

# Do not force a platform: under the driver this sees the real TPU chip.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

A100_RSPMM_EDGES_PER_SEC = 2.5e8

# FB15k-237 shape (train split: 272,115 triples -> 544,230 edges with
# inverses; 14,541 entities; 237*2 relations)
V, E_DIRECT, R_DIRECT = 14541, 272115, 237
B, D = 8, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_rspmm():
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm import generalized_rspmm

    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0)
    ei, et = with_inverses(trip, R_DIRECT)
    e_live = ei.shape[1]
    e_pad = pad_bucket(e_live, 8192)
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT, pad_to=e_pad)
    log(f"graph: V={V} E={e_live} (pad {e_pad}) R={2*R_DIRECT} feat={B}x{D}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, B, D)).astype(np.float32))

    results = {}
    for backend in ("xla", "xla_chunked"):
        try:
            fn = jax.jit(
                lambda x, rel: generalized_rspmm(
                    graph.edge_index,
                    graph.edge_type,
                    graph.edge_weight,
                    rel,
                    x,
                    sum="add",
                    mul="mul",
                    num_nodes=V,
                    backend=backend,
                    chunk=32768,
                )
            )
            out = fn(x, rel)
            out.block_until_ready()
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x, rel)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            eps = e_live / dt
            results[backend] = eps
            log(f"rspmm[{backend}]: {dt*1e3:.2f} ms/call, {eps/1e6:.1f} M edges/s")
        except Exception as exc:  # noqa: BLE001
            log(f"rspmm[{backend}] failed: {type(exc).__name__}: {exc}")

    try:
        from ultra_tpu.ops import rspmm_pallas  # noqa: F401

        # pallas backend, if built
        fn = jax.jit(
            lambda x, rel: generalized_rspmm(
                graph.edge_index,
                graph.edge_type,
                graph.edge_weight,
                rel,
                x,
                sum="add",
                mul="mul",
                num_nodes=V,
                backend="pallas",
            )
        )
        out = fn(x, rel)
        out.block_until_ready()
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, rel)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        results["pallas"] = e_live / dt
        log(f"rspmm[pallas]: {dt*1e3:.2f} ms/call, {e_live/dt/1e6:.1f} M edges/s")
    except ImportError:
        pass
    except Exception as exc:  # noqa: BLE001
        log(f"rspmm[pallas] failed: {type(exc).__name__}: {exc}")

    return max(results.values()), results


def main():
    log(f"devices: {jax.devices()}")
    best, results = bench_rspmm()
    print(
        json.dumps(
            {
                "metric": "rspmm_edges_per_sec_chip",
                "value": round(best, 1),
                "unit": "edges/s",
                "vs_baseline": round(best / A100_RSPMM_EDGES_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
