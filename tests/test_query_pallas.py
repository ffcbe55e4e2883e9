"""UltraQuery with Pallas-planned graphs (interpreter mode on CPU): eval
forward matches the XLA path; a training step with per-slot chunk-padded
relation-graph plans runs under one jit trace."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu.query import ops
from ultra_tpu.query.executor import QueryConfig
from ultra_tpu.query.trainer import (
    evaluate_queries,
    make_query_train_step,
    prepare_query_graph,
    train_queries,
)
from ultra_tpu.train.loop import init_ultra_params
from tests.test_query_trainer import small_cfg, toy_query_dataset


def test_eval_with_plans_matches_xla():
    ds = toy_query_dataset()
    cfg = small_cfg()
    qcfg = QueryConfig(dropout_ratio=0.0)
    params = init_ultra_params(cfg, jax.random.key(0))
    (_, _), (_, _), (lo, hi) = ds.split_ranges()
    idx = np.arange(lo, hi)

    g_plain = prepare_query_graph(ds.graphs[2], with_plans=False)
    g_plans = prepare_query_graph(ds.graphs[2], with_plans=True)
    assert g_plans.plans is not None and g_plans.relation_graph.plans is not None

    m1 = evaluate_queries(params, cfg, qcfg, g_plain, ds, idx, batch_size=4,
                          metric_names=("mrr",))
    m2 = evaluate_queries(params, cfg, qcfg, g_plans, ds, idx, batch_size=4,
                          metric_names=("mrr",))
    np.testing.assert_allclose(m1["mrr"], m2["mrr"], rtol=1e-3, atol=1e-4)


def test_train_with_plans_single_trace(tmp_path):
    """Two steps with dropout: per-slot rel graphs chunk-padded to the base
    plan's count must re-use one compiled trace (shape stability)."""
    ds = toy_query_dataset()
    cfg = small_cfg()
    qcfg = QueryConfig(dropout_ratio=0.5)
    params = init_ultra_params(cfg, jax.random.key(1))

    run_cfg = {
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 2},
        "task": {"adversarial_temperature": 0.2},
        "optimizer": {"lr": 1e-3},
    }
    # monkey-path prepare to force plans on CPU
    import ultra_tpu.query.trainer as T

    orig = T.prepare_query_graph
    try:
        T.prepare_query_graph = lambda qg, rel_pad_to=None, with_plans=None: orig(
            qg, rel_pad_to, with_plans=True
        )
        out = train_queries(run_cfg, cfg, qcfg, params, ds, str(tmp_path), seed=0)
    finally:
        T.prepare_query_graph = orig
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()
