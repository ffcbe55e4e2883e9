"""Serving API: top-k matches exhaustive scoring; head prediction uses the
inverse relation."""

import jax
import numpy as np

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig, ultra_score_all
from ultra_tpu.serve import UltraPredictor
from ultra_tpu.train.loop import init_ultra_params


def test_predictor_topk_matches_score_all():
    graph, ei, et = synthetic_graph(num_nodes=30, num_direct_rel=4, num_triples=120, seed=1)
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16, 16), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    pred = UltraPredictor(params, cfg, graph, batch_size=4)

    h = np.array([0, 5, 9])
    r = np.array([1, 3, 0])
    scores, tails = pred.predict_tails(h, r, k=5)
    assert scores.shape == (3, 5) and tails.shape == (3, 5)

    import jax.numpy as jnp

    full = np.asarray(ultra_score_all(params, cfg, graph, jnp.asarray(h), r_index=jnp.asarray(r)))
    for i in range(3):
        order = np.argsort(-full[i])[:5]
        np.testing.assert_allclose(scores[i], full[i][order], rtol=1e-4, atol=1e-5)

    # head prediction == tails under inverse relation
    s2, t2 = pred.predict_heads(h, r, k=5)
    inv = np.asarray(ultra_score_all(
        params, cfg, graph, jnp.asarray(h), r_index=jnp.asarray(r + graph.num_relations // 2)
    ))
    for i in range(3):
        np.testing.assert_allclose(s2[i], np.sort(inv[i])[::-1][:5], rtol=1e-4, atol=1e-5)
