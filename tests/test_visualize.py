"""Path-interpretation tests: edge gradients flow, beams produce valid,
contiguous paths from head to tail over existing edges."""

import jax
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.models.visualize import edge_gradients, visualize
from ultra_tpu.train.loop import init_ultra_params


def setup(aggregate_func="sum", message_func="distmult"):
    graph, ei, et = synthetic_graph(num_nodes=20, num_direct_rel=3, num_triples=60, seed=9)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=4,
            aggregate_func=aggregate_func, message_func=message_func,
        ),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1, project_relations=True,
            aggregate_func=aggregate_func, message_func=message_func,
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    return graph, ei, et, cfg, params


def test_edge_gradients_nonzero():
    graph, ei, et, cfg, params = setup()
    h, t, r = int(ei[0, 0]), int(ei[1, 0]), int(et[0])
    grads = edge_gradients(params, cfg, graph, h, t, r)
    assert len(grads) == 2  # one per entity layer
    assert any(np.abs(g).sum() > 0 for g in grads)
    assert all(g.shape == (graph.num_edges_padded,) for g in grads)


def test_visualize_paths_are_valid():
    graph, ei, et, cfg, params = setup()
    h, t, r = int(ei[0, 0]), int(ei[1, 0]), int(et[0])
    paths, weights = visualize(params, cfg, graph, h, t, r, num_beam=5, path_topk=5)
    assert len(paths) == len(weights)
    edge_set = set(zip(ei[0], ei[1], et))
    for path in paths:
        assert 1 <= len(path) <= 2
        assert path[0][0] == h
        assert path[-1][1] == t
        for (eh, et_, er) in path:
            assert (eh, et_, er) in edge_set
        for (a, b) in zip(path[:-1], path[1:]):
            assert a[1] == b[0]  # contiguous


@pytest.mark.parametrize(
    "agg,msg",
    [("mean", "distmult"), ("max", "distmult"), ("pna", "distmult"),
     ("sum", "rotate"), ("max", "rotate")],
)
def test_visualize_all_aggregators(agg, msg):
    """Non-sum aggregators and rotate flow gradients and yield valid paths
    (reference fallback coverage, base_nbfnet.py:156-263 + layers.py:135-181)."""
    graph, ei, et, cfg, params = setup(aggregate_func=agg, message_func=msg)
    h, t, r = int(ei[0, 0]), int(ei[1, 0]), int(et[0])
    grads = edge_gradients(params, cfg, graph, h, t, r)
    assert any(np.abs(g).sum() > 0 for g in grads)
    paths, weights = visualize(params, cfg, graph, h, t, r, num_beam=5, path_topk=5)
    edge_set = set(zip(ei[0], ei[1], et))
    for path in paths:
        assert path[0][0] == h and path[-1][1] == t
        for e in path:
            assert e in edge_set
