"""On-chip validation + timing of UltraQuery training with traversal dropout.

Runs the real query train step (ultra 64-d/6-layer stack, B=8 mixed 2p/2i,
dropout 0.25) on an FB15k-237-sized synthetic graph using the DropoutPlanner
fast path (base relation graph + per-round weight masks, shared Pallas plan).
Prints host-prep and device-step times.

Usage (one TPU process at a time!):
    python scripts/chip_query_train.py [--steps 4] [--small]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--small", action="store_true", help="tiny graph (CPU smoke)")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="micro-batch the query batch (grouped step only)")
    ap.add_argument("--grouped", action="store_true",
                    help="round-grouped projections (train.grouped_projections)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb

        xb._backend_factories.pop("axon", None)

    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
    from ultra_tpu.query import ops
    from ultra_tpu.query.datasets import QueryGraph
    from ultra_tpu.query.executor import (DropoutPlanner, QueryConfig, simulate_symbolic, simulate_symbolic_grouped, projection_schedule, graphs_for_slots)
    from ultra_tpu.query.trainer import answers_to_mask, make_grouped_query_train_step, make_query_train_step, prepare_query_graph
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.train.loop import init_train_state, init_ultra_params, make_optimizer

    print("devices:", jax.devices(), flush=True)
    if args.small:
        v, rr, t = 200, 12, 1200
    else:
        v, rr, t = 14541, 237, 272115
    trip = random_kg_triples(v, rr, t, seed=0)
    ei, et = with_inverses(trip, rr)
    r = 2 * rr

    t0 = time.perf_counter()
    qg = QueryGraph(ei, et, v, r, inverse_rel_plus_one=False)
    graph = prepare_query_graph(qg)
    print(f"graph+plans: {time.perf_counter() - t0:.1f}s", flush=True)
    host = {
        "edge_index": ei, "edge_type": et, "num_nodes": v, "num_relations": r,
        "e_pad": graph.num_edges_padded, "inverse_rel_plus_one": False,
    }
    t0 = time.perf_counter()
    planner = DropoutPlanner(host)
    print(f"planner init: {time.perf_counter() - t0:.1f}s", flush=True)

    d, n = args.dim, args.layers
    remat = not args.no_remat and not args.small
    cfg = UltraConfig(
        relation_model=NBFNetConfig(
            input_dim=d, hidden_dims=(d,) * n, num_relation=4, remat=remat
        ),
        entity_model=NBFNetConfig(
            input_dim=d, hidden_dims=(d,) * n, num_relation=1,
            project_relations=True, remat=remat,
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    qcfg = QueryConfig(dropout_ratio=0.25)
    opt = make_optimizer()
    state = init_train_state(params, opt)
    if args.grouped:
        step_fn = make_grouped_query_train_step(
            cfg, qcfg, opt, grad_accum=args.grad_accum)
    else:
        assert args.grad_accum == 1, "grad_accum needs --grouped"
        step_fn = make_query_train_step(cfg, qcfg, opt)

    rng = np.random.default_rng(0)
    qs = []
    for _ in range(4):
        e0 = int(rng.integers(0, v))
        r1, r2 = int(rng.integers(0, r)), int(rng.integers(0, r))
        qs.append(np.array([e0, ops.PROJECTION | r1, ops.PROJECTION | r2, ops.STOP], np.int64))
    for _ in range(4):
        e1, e2 = int(rng.integers(0, v)), int(rng.integers(0, v))
        r1, r2 = int(rng.integers(0, r)), int(rng.integers(0, r))
        qs.append(
            np.array(
                [e1, ops.PROJECTION | r1, e2, ops.PROJECTION | r2,
                 ops.INTERSECTION | 2, ops.STOP], np.int64,
            )
        )
    kind, operand = ops.decompose(ops.pad_queries(qs, 8))
    target = (rng.random((8, v)) < 0.01).astype(np.float32)

    for i in range(args.steps):
        t0 = time.perf_counter()
        if args.grouped:
            round_of, has_proj, arg_slot, n_rounds = projection_schedule(kind)
            plan = simulate_symbolic_grouped(
                kind, operand, round_of, has_proj, arg_slot, n_rounds,
                host, qcfg, rng, planner,
            )
            slots = graphs_for_slots(graph, plan)
            t_host = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, loss = step_fn(state, slots, kind, operand, target)
        else:
            plan = simulate_symbolic(
                kind, operand, host, qcfg, rng, training=True, planner=planner
            )
            slots = graphs_for_slots(graph, plan)
            t_host = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, loss = step_fn(
                state, slots, jnp.asarray(kind), jnp.asarray(operand), jnp.asarray(target)
            )
        loss = float(loss)
        t_dev = time.perf_counter() - t0
        print(
            f"step {i}: host prep {t_host * 1000:.0f} ms, device {t_dev:.2f} s, "
            f"loss {loss:.4f}", flush=True,
        )


if __name__ == "__main__":
    main()
