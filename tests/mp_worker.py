"""Worker process for the REAL 2-process cluster test (test_multiprocess.py).

Each worker owns 4 virtual CPU devices; the two form an 8-device global mesh
over a localhost Gloo coordinator — the same single-controller topology as a
2-host TPU slice (DCN -> localhost TCP). It exercises the full multi-process
data path: shard_indices (DistributedSampler semantics), per_process_rng
(rank-coupled negative sampling, run.py:234), host_local_batch_to_global
(global sharded batch from per-process rows), the sharded train step, and
gather_ranks. Prints losses + a parameter checksum for the driver to compare
against the single-process ground truth.
"""

import sys

import numpy as np


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "step"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import jax.numpy as jnp

    from ultra_tpu import tasks
    from ultra_tpu.data.synthetic import synthetic_graph
    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
    from ultra_tpu.parallel import multihost
    from ultra_tpu.parallel.dp import make_sharded_train_step
    from ultra_tpu.parallel.mesh import make_mesh
    from ultra_tpu.train.loop import init_train_state, init_ultra_params, make_optimizer

    graph, ei, et = synthetic_graph(
        num_nodes=24, num_direct_rel=4, num_triples=100, seed=5, pad_edges_to=208
    )
    # graph is identical on every process -> pass as replicated numpy leaves
    graph = jax.tree.map(np.asarray, graph)
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(1))

    if mode == "edge":
        # edge-partitioned PALLAS rspmm across the 2-process mesh: stacked
        # per-shard plans shard over the 'edge' axis spanning both hosts
        from ultra_tpu.ops.rspmm_pallas import build_sharded_plans
        from ultra_tpu.parallel.dp import make_sharded_score_step

        e = ei.shape[1]
        e_pad = graph.num_edges_padded
        host_edges = (
            np.pad(ei, ((0, 0), (0, e_pad - e))),
            np.pad(et, (0, e_pad - e)),
            np.pad(np.ones(e, np.float32), (0, e_pad - e)),
        )
        graph_sp = build_sharded_plans(graph, 2, rb=16, chunk=32, host_edges=host_edges)
        graph_sp = jax.tree.map(np.asarray, graph_sp)
        mesh = make_mesh(data=4, edge=2)
        rng = np.random.default_rng(7)
        b = 8
        batch = np.stack(
            [rng.integers(0, graph.num_nodes, size=b),
             rng.integers(0, graph.num_nodes, size=b),
             rng.integers(0, graph.num_relations // 2, size=b)], axis=1,
        )
        score_step = make_sharded_score_step(mesh, cfg, graph_sp)
        t_pred, h_pred = score_step(params, graph_sp, jnp.asarray(batch))
        print(f"RESULT tsum {float(jnp.sum(t_pred)):.6f}", flush=True)
        print(f"RESULT hsum {float(jnp.sum(h_pred)):.6f}", flush=True)
        return

    if mode == "query":
        import tempfile

        sys.path.insert(0, "/root/repo/tests")
        from test_query_datasets import write_transductive_fixture

        from ultra_tpu.query import datasets as qds
        from ultra_tpu.query.executor import QueryConfig
        from ultra_tpu.query.trainer import evaluate_queries, prepare_query_graph

        root = tempfile.mkdtemp(prefix=f"qfix{pid}-")
        write_transductive_fixture(root, name="toy-betae")

        class ToyBetae(qds.LogicalQueryDataset):
            name = "toy-betae"

        ds = ToyBetae(root).load()
        qgraph = prepare_query_graph(ds.graphs[2], with_plans=False)
        qcfg = QueryConfig(dropout_ratio=0.0)
        qcfg_cfg = cfg  # reuse the small UltraConfig/params from above
        (_, _), (_, _), (lo, hi) = ds.split_ranges()
        m = evaluate_queries(
            params, qcfg_cfg, qcfg, qgraph, ds, np.arange(lo, hi), batch_size=2,
            metric_names=("mrr", "hits@10"),
        )
        for k in sorted(m):
            print(f"RESULT {k} {m[k]:.8f}", flush=True)
        return

    if mode == "trainer":
        from ultra_tpu.train.distributed import evaluate_distributed, train_distributed

        n_direct = ei.shape[1] // 2
        triples = np.stack(
            [ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1
        )
        out = train_distributed(
            {"batch_size": 4, "num_epoch": 2, "batch_per_epoch": 3},
            {"num_negative": 4, "adversarial_temperature": 1.0},
            cfg, params, graph, index, triples, seed=13, lr=1e-3,
        )
        checksum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(out))
        print(f"RESULT checksum {checksum:.8f}", flush=True)
        m = evaluate_distributed(
            out, cfg, graph, triples[:16], index, batch_size=4, metrics=("mrr", "mr")
        )
        print(f"RESULT mrr {m['mrr']:.8f} mr {m['mr']:.6f}", flush=True)
        return

    # --- per-process data loading -----------------------------------------
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    my_idx = multihost.shard_indices(len(triples), epoch=0, seed=7)[:4]
    rng = multihost.per_process_rng(11)
    local_batch = tasks.negative_sampling(index, triples[my_idx], num_negative=4, rng=rng)

    # easy-edge mask is a property of the GLOBAL batch (single-process
    # semantics remove every batch row's edges) -> union of per-rank masks
    all_rows = []
    for p in range(2):
        p_idx = multihost.shard_indices(
            len(triples), epoch=0, seed=7, process_id=p, num_processes=2
        )[:4]
        p_rng = np.random.default_rng(11 + p)
        all_rows.append(
            tasks.negative_sampling(index, triples[p_idx], num_negative=4, rng=p_rng)
        )
    global_batch = np.concatenate(all_rows)
    ew = tasks.easy_edge_weights(index, global_batch, graph.num_edges_padded)
    assert (np.asarray(local_batch) == all_rows[pid]).all()

    mesh = make_mesh(data=8, edge=1)
    batch_g = multihost.host_local_batch_to_global(mesh, np.asarray(local_batch))

    opt = make_optimizer(lr=1e-3)
    step = make_sharded_train_step(mesh, cfg, opt, graph, num_negative=4)
    state = init_train_state(params, opt)
    for i in range(2):
        state, loss = step(state, graph, batch_g, jnp.asarray(ew))
        print(f"RESULT loss[{i}] {float(loss):.10f}", flush=True)
    checksum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(state.params))
    print(f"RESULT checksum {checksum:.8f}", flush=True)

    # --- cross-process metric gather --------------------------------------
    local_ranks = np.arange(3 + pid, dtype=np.int64) + 10 * pid  # ragged on purpose
    gathered = multihost.gather_ranks(local_ranks)
    print(f"RESULT gather {' '.join(map(str, gathered.tolist()))}", flush=True)


if __name__ == "__main__":
    main()
