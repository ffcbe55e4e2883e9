"""Real multi-process tests: a 2-process JAX CPU cluster (localhost Gloo
coordinator, 4 virtual devices per process = 8-device global mesh) runs the
sharded train step on per-process-loaded data and must reproduce the
single-process result bit-for-bit-close. This is the executable stand-in for
a 2-host TPU slice (SURVEY.md §2.8) — same single-controller code path,
DCN swapped for localhost TCP."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu import tasks
from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.parallel import multihost
from ultra_tpu.parallel.dp import make_sharded_train_step
from ultra_tpu.parallel.mesh import make_mesh
from ultra_tpu.train.loop import init_train_state, init_ultra_params, make_optimizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shard_indices_partition():
    """DistributedSampler semantics: disjoint-by-rank, full coverage after
    wrap-padding, equal per-rank counts, same permutation on every rank."""
    for n, world in [(10, 2), (7, 4), (16, 4), (5, 8)]:
        shards = [
            multihost.shard_indices(n, epoch=3, seed=1, process_id=p, num_processes=world)
            for p in range(world)
        ]
        sizes = {len(s) for s in shards}
        assert len(sizes) == 1  # equal counts (static global batch shapes)
        got = np.concatenate(shards)
        assert set(got.tolist()) == set(range(n))  # coverage incl. wrap pad
        assert len(got) == -(-n // world) * world
    # different epochs reshuffle
    a = multihost.shard_indices(64, epoch=0, seed=1, process_id=0, num_processes=2)
    b = multihost.shard_indices(64, epoch=1, seed=1, process_id=0, num_processes=2)
    assert not (a == b).all()


def test_host_local_batch_to_global_single_process():
    mesh = make_mesh(data=8, edge=1)
    local = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = multihost.host_local_batch_to_global(mesh, local)
    assert g.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g), local)
    # actually sharded over the data axis
    assert len(g.sharding.device_set) == 8


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _ground_truth():
    """Single-process reference: same graph, same global batch (process-
    ordered concat of each rank's shard with its rank-coupled rng)."""
    graph, ei, et = synthetic_graph(
        num_nodes=24, num_direct_rel=4, num_triples=100, seed=5, pad_edges_to=208
    )
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(1))
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)
    rows = []
    for p in range(2):
        idx = multihost.shard_indices(
            len(triples), epoch=0, seed=7, process_id=p, num_processes=2
        )[:4]
        rows.append(
            tasks.negative_sampling(
                index, triples[idx], num_negative=4, rng=np.random.default_rng(11 + p)
            )
        )
    batch = np.concatenate(rows)
    ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)

    mesh = make_mesh(data=8, edge=1)
    opt = make_optimizer(lr=1e-3)
    step = make_sharded_train_step(mesh, cfg, opt, graph, num_negative=4)
    state = init_train_state(params, opt)
    losses = []
    for _ in range(2):
        state, loss = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
        losses.append(float(loss))
    checksum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(state.params))
    return losses, checksum


def _run_workers(mode="step"):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(p), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    def results(out):
        # Gloo logs interleave on stdout and can merge with a RESULT line —
        # match the marker anywhere in the line
        found = []
        for line in out.splitlines():
            if "RESULT " in line:
                found.append(line[line.index("RESULT ") + len("RESULT "):])
        return found

    return results(outs[0]), results(outs[1])


def test_two_process_train_matches_single_process():
    r0, r1 = _run_workers("step")
    assert r0 == r1, (r0, r1)  # replicated loss/params identical across processes

    losses_ref, checksum_ref = _ground_truth()
    got = dict(r.split(None, 1) for r in r0[:3])
    assert abs(float(got["loss[0]"]) - losses_ref[0]) < 1e-6
    assert abs(float(got["loss[1]"]) - losses_ref[1]) < 1e-6
    assert abs(float(got["checksum"]) - checksum_ref) < 5e-4 * abs(checksum_ref)

    gather_line = r0[3].split()[1:]
    # rank 0 contributes [0,1,2], rank 1 contributes [10,11,12,13]
    assert [int(x) for x in gather_line] == [0, 1, 2, 10, 11, 12, 13]


def _trainer_ground_truth():
    """Replicate train_distributed's 2-process schedule in-process: same
    shards, same rank-coupled rng streams, same global batches; drive the
    sharded step on the local 8-device mesh. Then eval on the full set."""
    graph, ei, et = synthetic_graph(
        num_nodes=24, num_direct_rel=4, num_triples=100, seed=5, pad_edges_to=208
    )
    index = tasks.GraphIndex.build(ei, et, graph.num_nodes, graph.num_relations)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(1))
    n_direct = ei.shape[1] // 2
    triples = np.stack([ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1)

    mesh = make_mesh(edge=1)
    opt = make_optimizer(lr=1e-3)
    step = make_sharded_train_step(
        mesh, cfg, opt, graph, adversarial_temperature=1.0, num_negative=4
    )
    state = init_train_state(params, opt)
    seed, world, bs = 13, 2, 4
    rank_rngs = [np.random.default_rng(seed + p) for p in range(world)]
    for epoch in range(2):
        shards = [
            multihost.shard_indices(
                len(triples), epoch=epoch, seed=seed, process_id=p, num_processes=world
            )
            for p in range(world)
        ]
        for s in range(3):
            rows = []
            for p in range(world):
                take = shards[p][(s * bs) % len(shards[p]):][:bs]
                if len(take) < bs:
                    take = np.concatenate([take, shards[p][: bs - len(take)]])
                rows.append(
                    tasks.negative_sampling(
                        index, triples[take], 4, strict=True, rng=rank_rngs[p]
                    )
                )
            batch = np.concatenate(rows)
            ew = tasks.easy_edge_weights(index, batch, graph.num_edges_padded)
            state, _ = step(state, graph, jnp.asarray(batch), jnp.asarray(ew))
    checksum = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(state.params)
    )
    from ultra_tpu.train import eval as eval_lib

    m = eval_lib.evaluate(
        state.params, cfg, graph, triples[:16], index, batch_size=4,
        metrics=("mrr", "mr"),
    )
    return checksum, m


def test_two_process_edge_sharded_pallas_scores():
    """Edge-partitioned Pallas rspmm with the edge axis spanning BOTH
    processes reproduces the single-process all-node scores (the §2.8
    graph-partitioning north star, previously virtual-mesh only)."""
    from ultra_tpu.models.nbfnet import ultra_score_all

    r0, r1 = _run_workers("edge")
    assert r0 == r1, (r0, r1)

    graph, ei, et = synthetic_graph(
        num_nodes=24, num_direct_rel=4, num_triples=100, seed=5, pad_edges_to=208
    )
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(7)
    b = 8
    batch = np.stack(
        [rng.integers(0, graph.num_nodes, size=b),
         rng.integers(0, graph.num_nodes, size=b),
         rng.integers(0, graph.num_relations // 2, size=b)], axis=1,
    )
    t_ref = ultra_score_all(
        params, cfg, graph, jnp.asarray(batch[:, 0]), r_index=jnp.asarray(batch[:, 2])
    )
    got = dict(r.split() for r in r0)
    assert abs(float(got["tsum"]) - float(jnp.sum(t_ref))) < 5e-2 * max(
        1.0, abs(float(jnp.sum(t_ref)))
    )


def test_two_process_query_eval_matches_single_process():
    """evaluate_queries shards queries over a REAL 2-process cluster and its
    gathered metrics equal the single-process run (reference gather_results
    semantics, query_utils.py:238-282)."""
    import tempfile

    r0, r1 = _run_workers("query")
    assert r0 == r1, (r0, r1)

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_query_datasets import write_transductive_fixture

    from ultra_tpu.query import datasets as qds
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import evaluate_queries, prepare_query_graph

    root = tempfile.mkdtemp(prefix="qfix-ref-")
    write_transductive_fixture(root, name="toy-betae")

    class ToyBetae(qds.LogicalQueryDataset):
        name = "toy-betae"

    ds = ToyBetae(root).load()
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=32, hidden_dims=(32, 32), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=32, hidden_dims=(32, 32), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(1))
    qgraph = prepare_query_graph(ds.graphs[2], with_plans=False)
    (_, _), (_, _), (lo, hi) = ds.split_ranges()
    m_ref = evaluate_queries(
        params, cfg, QueryConfig(dropout_ratio=0.0), qgraph, ds,
        np.arange(lo, hi), batch_size=2, metric_names=("mrr", "hits@10"),
    )
    got = dict(r.rsplit(None, 1) for r in r0)  # metric keys contain spaces
    assert set(got) == set(m_ref)
    for k, v in m_ref.items():
        assert abs(float(got[k]) - v) < 1e-6, (k, got[k], v)


def test_two_process_trainer_loop_matches_replayed_schedule():
    """train_distributed + evaluate_distributed across a REAL 2-process
    cluster == the same schedule replayed single-process."""
    r0, r1 = _run_workers("trainer")
    assert r0 == r1, (r0, r1)
    checksum_ref, m_ref = _trainer_ground_truth()
    got_checksum = float(r0[0].split()[1])
    assert abs(got_checksum - checksum_ref) < 5e-4 * abs(checksum_ref)
    _, mrr, _, mr = r0[1].split()
    assert abs(float(mrr) - m_ref["mrr"]) < 1e-5
    assert abs(float(mr) - m_ref["mr"]) < 1e-3
