"""On-chip CLQA eval throughput: slot-synchronous vs round-grouped executor
on a mixed 14-type batch (VERDICT r1 #6 measurement).

Both executors pay one full-batch QueryNBFNet call per projection "round";
slot-synchronous rounds = #program slots where any query projects, grouped
rounds = max projections per query (3 on the BetaE mix). Uses the eval
configuration: shared graph, precomputed relation cache, no dropout.
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
ITERS = 4
ROUNDS = 3
L = 9  # padded program length


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mixed_batch(rng, v, r):
    from ultra_tpu.query import ops

    e = lambda: int(rng.integers(0, v))
    rr = lambda: ops.PROJECTION | int(rng.integers(0, r))
    I2, U2, N = ops.INTERSECTION | 2, ops.UNION | 2, ops.NEGATION
    qs = [
        [e(), rr()],                                  # 1p
        [e(), rr(), rr()],                            # 2p
        [e(), rr(), rr(), rr()],                      # 3p
        [e(), rr(), e(), rr(), I2],                   # 2i
        [e(), rr(), e(), rr(), I2, e(), rr(), I2],    # 3i
        [e(), rr(), e(), rr(), I2, rr()],             # ip
        [e(), rr(), rr(), e(), rr(), I2],             # pi
        [e(), rr(), e(), rr(), N, I2],                # 2in
        [e(), rr(), e(), rr(), I2, e(), rr(), N, I2][:8],  # 3in (trunc pad)
        [e(), rr(), e(), rr(), N, I2, rr()],          # inp
        [e(), rr(), rr(), e(), rr(), N, I2],          # pin
        [e(), rr(), rr(), N, e(), rr(), I2],          # pni
        [e(), rr(), e(), rr(), U2],                   # 2u
        [e(), rr(), e(), rr(), U2, rr()],             # up
    ]
    qs = [np.asarray(q + [ops.STOP], np.int64) for q in qs]
    return ops.pad_queries(qs, L)


def main():
    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.models.nbfnet import UltraConfig
    from ultra_tpu.ops.rspmm_pallas import attach_plans
    from ultra_tpu.query import ops
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import (
        make_query_forward,
        make_query_forward_grouped,
    )
    from ultra_tpu.train.eval import precompute_relation_representations
    from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
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
    qcfg = QueryConfig(dropout_ratio=0.0, threshold=0.8)

    query = mixed_batch(rng, V, 2 * R_DIRECT)
    kind, operand = ops.decompose(query)
    b = kind.shape[0]
    proj_slots = int(((kind == ops.K_PROJECTION).any(axis=0)).sum())
    from ultra_tpu.query.executor import projection_schedule
    _, _, _, n_rounds = projection_schedule(kind)
    log(f"mixed batch B={b}: slot-synchronous GNN calls {proj_slots}, "
        f"grouped rounds {n_rounds}")

    rel_reprs_all = precompute_relation_representations(params, cfg, graph)
    jax.block_until_ready(rel_reprs_all)

    fwd_slot = make_query_forward(cfg, qcfg)
    fwd_grp = make_query_forward_grouped(cfg, qcfg)

    kj, oj = jnp.asarray(kind), jnp.asarray(operand)
    o1 = fwd_slot(params, graph, kj, oj, rel_reprs_all)
    o2 = fwd_grp(params, graph, kind, operand, rel_reprs_all)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    log(f"parity max abs diff (logits): {err:.2e}")

    def time_one(f, *args):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        return (time.perf_counter() - t0) * 1e3

    res = {"slot": [], "grouped": []}
    for _ in range(ROUNDS * ITERS):
        res["slot"].append(time_one(fwd_slot, params, graph, kj, oj, rel_reprs_all))
        res["grouped"].append(
            time_one(fwd_grp, params, graph, kind, operand, rel_reprs_all)
        )
    for name, ms in res.items():
        msl = sorted(ms)
        med = msl[len(msl) // 2]
        log(f"{name}: median {med:.0f} ms ({b/(med*1e-3):.0f} q/s) "
            f"best {msl[0]:.0f} ms")


if __name__ == "__main__":
    main()
