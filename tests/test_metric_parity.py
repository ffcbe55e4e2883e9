"""End-to-end METRIC parity: the full evaluation pipeline (both prediction
directions, strict filtered masks, mr/mrr/hits@k) on a synthetic KG with the
real ultra_3g weights must reproduce the same numbers as an independent
torch-oracle pipeline. This is the strongest offline proxy for the
zero-shot benchmark parity that needs downloaded datasets."""

import os

import jax
import numpy as np
import pytest
import torch

from ultra_tpu import tasks
from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
from ultra_tpu.data.kg import KGSplit, split_to_graph
from ultra_tpu.models.nbfnet import UltraConfig
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

CKPT = "/root/reference/ckpts/ultra_3g.pth"
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT), reason="no reference ckpt")


def oracle_metrics(params_np, ent_graph, rel_graph, triples, index):
    """Independent torch pipeline: score both directions, filter, rank."""
    from tests.oracle_torch import rel_nbfnet_oracle, entity_nbfnet_oracle

    num_direct = index.num_relations // 2
    ranks = []
    for h, t, r in triples:
        t_mask, h_mask = tasks.strict_negative_mask(index, np.array([[h, t, r]]))
        # t-direction
        rel_repr = rel_nbfnet_oracle(params_np["relation_model"], rel_graph, np.array([r]))
        t_pred, _ = entity_nbfnet_oracle(
            params_np["entity_model"], ent_graph, rel_repr, np.array([h]), np.array([r])
        )
        t_pred = t_pred.numpy()[0]
        pos = t_pred[t]
        ranks.append(1 + int(((t_pred >= pos) & t_mask[0]).sum()))
        # h-direction: conditioned on r, queried at inverse relation from t
        h_pred, _ = entity_nbfnet_oracle(
            params_np["entity_model"], ent_graph, rel_repr, np.array([t]),
            np.array([r + num_direct]),
        )
        h_pred = h_pred.numpy()[0]
        pos = h_pred[h]
        ranks.append(1 + int(((h_pred >= pos) & h_mask[0]).sum()))
    ranks = np.asarray(ranks, dtype=np.float64)
    return {
        "mr": ranks.mean(),
        "mrr": (1.0 / ranks).mean(),
        "hits@10": (ranks <= 10).mean(),
    }


def test_full_eval_metric_parity():
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        trip = random_kg_triples(60, 8, 400, seed=13)
        ei, et = with_inverses(trip, 8)
        split = KGSplit(ei, et, 60, 16, trip[:, :2].T, trip[:, 2])
        graph = split_to_graph(split, with_plans=False)
        index = tasks.GraphIndex.build(ei, et, 60, 16)
        params_np = convert_ultra_checkpoint(CKPT)
        params = to_jax(params_np)
        cfg = UltraConfig()

        test_triples = trip[:16]
        got = eval_lib.evaluate(
            params, cfg, graph, test_triples, index, batch_size=4,
            metrics=("mr", "mrr", "hits@10"), cache_relations=False,
        )

        rg = graph.relation_graph
        ent_o = (np.asarray(graph.edge_index), np.asarray(graph.edge_type),
                 np.asarray(graph.edge_weight), graph.num_nodes)
        rel_o = (np.asarray(rg.edge_index), np.asarray(rg.edge_type),
                 np.asarray(rg.edge_weight), rg.num_nodes)
        expect = oracle_metrics(params_np, ent_o, rel_o, test_triples, index)

        # ranks are integers; tiny fp differences can flip ties, so allow a
        # one-tie margin on mr and tight relative agreement on mrr/hits
        assert abs(got["mr"] - expect["mr"]) <= 0.25, (got, expect)
        np.testing.assert_allclose(got["mrr"], expect["mrr"], rtol=2e-2)
        np.testing.assert_allclose(got["hits@10"], expect["hits@10"], atol=0.04)
    finally:
        jax.config.update("jax_default_matmul_precision", "default")
