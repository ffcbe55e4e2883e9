"""A/B the CLQA grouped-eval forward with the eval stream budget ON
(unsliced F=896 at the mixed-14 batch) vs OFF (training-width 768+128
split — the round-4 behavior), interleaved in one process.

Context: BENCH r5 smoke showed clqa_grouped_eval_qps 52 -> 37 vs r04 while
chained kernel medians matched r04 — suspect the round-5 eval budget
(commit 6a70073) LOSES at this shape even though it wins at the fused
B=8/F=1024 link-prediction scorer shape."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
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
    kind, operand = qops.decompose(
        benchmod._clqa_mixed_batch(np.random.default_rng(3), V, 2 * R_DIRECT)
    )
    rel_reprs = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_reprs)

    fwds = {}
    # budget ON = trace the closure under an explicit stream_budget
    # (unslice-if-it-fits, what the factory did before ddf7ae1); OFF =
    # plain trace -> the training slice gate (the shipped behavior after
    # the fix). The budget applies at trace time, so each variant gets its
    # own forward closure and the first (tracing) call decides its layout.
    for name, nbytes in (("budget_on", 2_800_000_000), ("budget_off", None)):
        fwd = make_query_forward_grouped(cfg, qcfg)
        if nbytes is not None:
            with v2.stream_budget(nbytes):
                jax.block_until_ready(fwd(params, graph, kind, operand, rel_reprs))
        else:
            jax.block_until_ready(fwd(params, graph, kind, operand, rel_reprs))
        fwds[name] = fwd

    import jax.numpy as jnp

    times = {n: [] for n in fwds}
    for _ in range(9):
        for n, fwd in fwds.items():
            # block_until_ready lies on the tunneled TPU (CLAUDE.md) —
            # force completion by fetching a reduction to host
            t0 = time.perf_counter()
            float(jnp.sum(fwd(params, graph, kind, operand, rel_reprs)))
            times[n].append(time.perf_counter() - t0)
    for n, ts in times.items():
        med = float(np.median(ts)) * 1e3
        print(f"{n}: median {med:.0f} ms = {kind.shape[0] / med * 1e3:.1f} q/s "
              f"(runs {['%.0f' % (t * 1e3) for t in ts]})")


if __name__ == "__main__":
    main()
