"""Does padding the mixed-14 CLQA eval batch to B=16 (F=1024 — the shape
where the eval unslice budget WINS on the LP scorer) beat the shipped
B=14/F=896 training-slice-gate path (267 ms)? Four variants interleaved:
B=14 sliced (shipped), B=14 unsliced, B=16 sliced, B=16 unsliced."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.ops import rspmm_pallas_v2 as v2
from ultra_tpu.query import ops as qops
from ultra_tpu.query.executor import QueryConfig
from ultra_tpu.query.trainer import make_query_forward_grouped
from ultra_tpu.train.eval import precompute_relation_representations
from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

V, R_DIRECT, E_DIRECT = benchmod.V, benchmod.R_DIRECT, benchmod.E_DIRECT


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
    cfg = UltraConfig()
    qcfg = QueryConfig(dropout_ratio=0.0, threshold=0.8)
    q14 = benchmod._clqa_mixed_batch(np.random.default_rng(3), V, 2 * R_DIRECT)
    pad_prog = np.asarray([0, qops.PROJECTION | 0, qops.STOP], np.int64)
    pad_row = qops.pad_queries([pad_prog], q14.shape[1])
    q16 = np.concatenate([q14, pad_row, pad_row])
    rel_reprs = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_reprs)

    fwds = {}
    for bname, q in (("B14", q14), ("B16", q16)):
        kind, operand = qops.decompose(q)
        for mode, nbytes in (("sliced", None), ("unsliced", 2_800_000_000)):
            fwd = make_query_forward_grouped(cfg, qcfg)
            if nbytes is None:
                jax.block_until_ready(fwd(params, graph, kind, operand, rel_reprs))
            else:
                with v2.stream_budget(nbytes):
                    jax.block_until_ready(
                        fwd(params, graph, kind, operand, rel_reprs)
                    )
            fwds[f"{bname}/{mode}"] = (fwd, kind, operand)

    times = {n: [] for n in fwds}
    for _ in range(9):
        for n, (fwd, kind, operand) in fwds.items():
            t0 = time.perf_counter()
            float(jnp.sum(fwd(params, graph, kind, operand, rel_reprs)))
            times[n].append(time.perf_counter() - t0)
    for n, ts in times.items():
        med = float(np.median(ts)) * 1e3
        print(f"{n}: median {med:.0f} ms = {14 / med * 1e3:.1f} real-q/s")


if __name__ == "__main__":
    main()
