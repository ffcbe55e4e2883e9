"""Pretrain-width sweep (VERDICT r2 #3): is there a v2 configuration that
beats v1's 1694 ms/step at F=4096 (bs 64, 512 negs, remat)?

Round-2 measured the sliced v2 streams LOSING end-to-end at this width
(2088 ms full-v2 vs 1694 full-v1) — the materialized gather streams churn
the HBM the remat pass needs. This sweeps the two in-design levers:

  - SLICE_BYTES: stream slice width (1e9 -> 5 slices of F~819; 2.6e9 -> 2
    slices of F=2048; 7e9 -> unsliced F=4096, ~5 GB stream — may OOM).
  - f_block: the kernel's inner F tile.

plus the v1 baseline, all in one process with slope-free wall timing (the
step itself is seconds — dispatch noise is negligible).

Usage (TPU): BS=64 NEG=512 python scripts/exp_pretrain_width.py
"""

import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SMOKE = os.environ.get("WIDTH_SMOKE", "") == "1"  # CPU shape/path check
if SMOKE:
    V, E_DIRECT, R_DIRECT = 300, 18000, 24
    BS, NEG = 8, 4
else:
    V, E_DIRECT, R_DIRECT = 14541, 272115, 237
    BS, NEG = int(os.environ.get("BS", 64)), int(os.environ.get("NEG", 512))
ITERS = int(os.environ.get("ITERS", 5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb

        xb._backend_factories.pop("axon", None)
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    import ultra_tpu.ops.rspmm_pallas as rp
    import ultra_tpu.ops.rspmm_pallas_v2 as v2mod
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.train.loop import (
        init_train_state, make_optimizer, make_train_step,
    )
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}  BS={BS} NEG={NEG} (F={BS * 64})")
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
    # attach ALL generations once (w3 included); per-variant graphs below
    # drop plan fields so the dispatch routes v1-only / v2-only / w3
    graph = attach_plans(
        graph, rb=384, chunk=128, w3=True,
        host_edges=(
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e)),
        ),
    )
    has_w3 = graph.plans.w3 is not None  # cell-waste gate may refuse
    g_w3 = graph
    graph = graph.replace(plans=graph.plans.replace(w3=None, w3src=None))

    params = to_jax(convert_ultra_checkpoint("/root/reference/ckpts/ultra_3g.pth"))
    cfg = UltraConfig()
    cfg = cfg.replace(
        relation_model=cfg.relation_model.replace(remat=True),
        entity_model=cfg.entity_model.replace(remat=True),
    )
    opt = make_optimizer()
    rng = np.random.default_rng(0)
    index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
    n_direct = e // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rows = triples[rng.choice(n_direct, size=BS, replace=False)]
    batch = tasks.negative_sampling(index, rows, num_negative=NEG, rng=rng)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
    batch, ew = jnp.asarray(batch), jnp.asarray(ew)

    g_v1 = graph.replace(plans=graph.plans.replace(v2=None, v2src=None))
    variants = [
        ("v1", g_v1, None, None, 1, True),
        ("v2 slices~819 (1e9)", graph, 1e9, 4096, 1, True),
        ("v2 slices=2048 (2.6e9)", graph, 2.6e9, 4096, 1, True),
        ("v2 unsliced (7e9)", graph, 7e9, 4096, 1, True),
        # grad accumulation: micro-batches at F<=2048 where v2 wins AND
        # remat traffic halves/quarters (numerics == full batch, tested)
        ("v2 grad_accum=2 (F=2048)", graph, 1e9, 2048, 2, True),
        ("v2 grad_accum=4 (F=1024)", graph, 1e9, 2048, 4, True),
        ("v1 grad_accum=2", g_v1, None, None, 2, True),
        # round-5: micro-batches shrink activation HBM ~BS/accum-fold —
        # small enough that REMAT MAY BE UNNECESSARY, saving the extra
        # forward pass remat pays per layer (the open <1300 ms lever)
        ("v2 grad_accum=8 (F=512)", graph, 1e9, 2048, 8, True),
        ("v2 ga=2 remat-OFF", graph, 1e9, 2048, 2, False),
        ("v2 ga=4 remat-OFF", graph, 1e9, 2048, 4, False),
        ("v2 ga=8 remat-OFF", graph, 1e9, 2048, 8, False),
        ("v2 ga=16 remat-OFF", graph, 1e9, 2048, 16, False),
    ]
    if has_w3:
        # w3 has NO materialized stream — the stream/remat HBM fight that
        # makes sliced v2 lose at F=4096 does not exist for it (fwd + d_x
        # route w3; d_rel stays on the sliced v2 clustered plan)
        variants += [
            ("w3 F=4096", g_w3, 1e9, 4096, 1, True),
            ("w3 grad_accum=2 (F=2048)", g_w3, 1e9, 2048, 2, True),
        ]
    else:
        log("w3 variants skipped: cell-waste gate refused the plan")
    cfg_remat = cfg
    cfg_nremat = cfg.replace(
        relation_model=cfg.relation_model.replace(remat=False),
        entity_model=cfg.entity_model.replace(remat=False),
    )
    for name, g, slice_bytes, max_f, accum, remat in variants:
        cfg = cfg_remat if remat else cfg_nremat
        if slice_bytes is not None:
            v2mod.SLICE_BYTES = int(slice_bytes)
            rp.V2_MAX_F = int(max_f)
        else:
            rp.V2_MAX_F = 2048  # v1 fallback regardless
        try:
            step = make_train_step(cfg, opt, num_negative=NEG, grad_accum=accum)
            state = init_train_state(params, opt)
            t0 = time.perf_counter()
            state, loss = step(state, g, batch, ew)
            float(loss)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                state, loss = step(state, g, batch, ew)
                float(loss)
                times.append((time.perf_counter() - t0) * 1e3)
            med = sorted(times)[len(times) // 2]
            log(f"{name}: median {med:.0f} ms/step (best {min(times):.0f}, "
                f"compile {compile_s:.0f}s) loss {float(loss):.4f}")
        except Exception as exc:  # noqa: BLE001 — OOM expected for unsliced
            log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
        finally:
            step = state = None  # noqa: F841 — drop compiled buffers
            gc.collect()


if __name__ == "__main__":
    main()
