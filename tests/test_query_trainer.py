"""Query trainer/eval tests on a synthetic query dataset (no pickles needed):
loss semantics vs hand-rolled numpy, a couple of training steps with
traversal dropout, full evaluation rollup."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu.data.synthetic import random_kg_triples
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.query import metrics as qmetrics
from ultra_tpu.query import ops
from ultra_tpu.query.datasets import QueryDataset, QueryGraph
from ultra_tpu.query.executor import QueryConfig
from ultra_tpu.query.trainer import (
    answers_to_mask,
    evaluate_queries,
    make_query_train_step,
    prepare_query_graph,
    query_bce_loss,
    train_queries,
)
from ultra_tpu.train.loop import init_ultra_params


def toy_query_dataset(seed=0, v=20, r_direct=3, n_queries=12):
    """Graph with inv_rel = rel + 1 convention; random 1p/2i queries with
    exact symbolic answers as easy answers."""
    rng = np.random.default_rng(seed)
    trip = random_kg_triples(v, r_direct, 60, seed=seed)
    # interleave direct (2r) and inverse (2r+1)
    h, t, r = trip[:, 0], trip[:, 1], trip[:, 2]
    ei = np.concatenate([np.stack([h, t]), np.stack([t, h])], axis=1)
    et = np.concatenate([2 * r, 2 * r + 1])
    num_rel = 2 * r_direct
    graph = QueryGraph(ei, et, v, num_rel, inverse_rel_plus_one=True)

    def answers_1p(e, rel):
        return set(ei[1, (ei[0] == e) & (et == rel)])

    queries, easies, hards, types = [], [], [], []
    id2type = ["1p", "2i"]
    for _ in range(n_queries // 2):
        e = int(ei[0, rng.integers(ei.shape[1])])
        rel = int(et[rng.integers(len(et))])
        queries.append(np.array([e, ops.PROJECTION | rel, ops.STOP], np.int64))
        ans = answers_1p(e, rel)
        easies.append(np.fromiter(ans, np.int64))
        hards.append(np.zeros(0, np.int64))
        types.append(0)
    for _ in range(n_queries - n_queries // 2):
        e1, e2 = rng.integers(0, v, 2)
        r1 = int(et[rng.integers(len(et))])
        r2 = int(et[rng.integers(len(et))])
        queries.append(
            np.array(
                [e1, ops.PROJECTION | r1, e2, ops.PROJECTION | r2,
                 ops.INTERSECTION | 2, ops.STOP], np.int64,
            )
        )
        ans = answers_1p(e1, r1) & answers_1p(e2, r2)
        easies.append(np.fromiter(ans, np.int64))
        hards.append(np.zeros(0, np.int64))
        types.append(1)

    n = len(queries)
    order = rng.permutation(n)
    queries = [queries[i] for i in order]
    easies = [easies[i] for i in order]
    hards = [hards[i] for i in order]
    types = np.asarray([types[i] for i in order])
    return QueryDataset(
        name="toy",
        graphs=(graph, graph, graph),
        queries=ops.pad_queries(queries, 8),
        types=types,
        easy_answers=easies,
        hard_answers=hards,
        num_samples=(n // 2, (n - n // 2) // 2, n - n // 2 - (n - n // 2) // 2),
        num_entity_for_sample=np.full(n, v, np.int64),
        id2type=id2type,
    )


def small_cfg():
    return UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16, 16), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1, project_relations=True
        ),
    )


def test_query_bce_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(3, 10)).astype(np.float32)
    target = (rng.random((3, 10)) < 0.3).astype(np.float32)
    target[:, 0] = 1  # ensure positives
    T = 0.5

    bce = np.logaddexp(0, pred) - pred * target
    w = np.zeros_like(pred)
    for i in range(3):
        pos = target[i] > 0.5
        w[i, pos] = 1.0 / pos.sum()
        neg = ~pos
        e = np.exp(pred[i, neg] / T - (pred[i, neg] / T).max())
        w[i, neg] = e / e.sum()
    expect = ((bce * w).sum(-1) / w.sum(-1)).mean()
    got = float(query_bce_loss(jnp.asarray(pred), jnp.asarray(target), T))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_train_steps_and_eval(tmp_path):
    ds = toy_query_dataset()
    cfg = small_cfg()
    qcfg = QueryConfig(dropout_ratio=0.25)
    params = init_ultra_params(cfg, jax.random.key(0))

    run_cfg = {
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 2},
        "task": {"adversarial_temperature": 0.2},
        "optimizer": {"lr": 1e-3},
    }
    out = train_queries(run_cfg, cfg, qcfg, params, ds, str(tmp_path), seed=0)
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()

    # epoch-level crash checkpoint (supervisor resume contract) + resume
    import os

    assert os.path.isdir(os.path.join(str(tmp_path), "model_latest"))
    run_cfg2 = dict(run_cfg, resume_from=os.path.join(str(tmp_path), "model_latest"))
    out2 = train_queries(run_cfg2, cfg, qcfg, params, ds, str(tmp_path), seed=0)
    for leaf in jax.tree.leaves(out2):
        assert np.isfinite(np.asarray(leaf)).all()

    graph = prepare_query_graph(ds.graphs[2])
    (_, _), (_, _), (lo, hi) = ds.split_ranges()
    m = evaluate_queries(
        out, cfg, qcfg, graph, ds, np.arange(lo, hi), batch_size=4,
        metric_names=("mrr", "hits@10", "mape"),
    )
    assert "mrr" in m and "[EPFO] mrr" in m
    assert 0 <= m["hits@10"] <= 1


def test_perfect_predictions_rank_one():
    """batch_evaluate sanity: scores == answer mask => every hard answer's
    filtered rank equals 1 + number of its (better-ranked) co-answers minus
    the filtered removal, i.e. exactly 1..num_hard mapped to 1."""
    v = 12
    pred = np.full((1, v), -5.0)
    easy = np.zeros((1, v), bool)
    hard = np.zeros((1, v), bool)
    easy[0, [2, 5]] = True
    hard[0, [7]] = True
    pred[0, [2, 5, 7]] = 10.0  # all answers top-3 (tied)
    rank, answer_rank, n_easy, n_hard = qmetrics.batch_evaluate(pred, easy, hard)
    assert n_easy[0] == 2 and n_hard[0] == 1
    assert rank[0] == 1  # filtered: easy answers removed from ahead
