"""Serving API: load once, answer (head, relation) -> top-k tail queries at
interactive latency.

The reference has no serving story (research scripts only); this wraps the
eval fast path for production use: relation representations for all R query
relations are precomputed once per graph (train/eval.py), per-request work
is a single jitted entity-GNN pass + top-k, and the jit cache is warmed at
construction so first-request latency is compile-free.

    predictor = UltraPredictor.from_checkpoint(ckpt, dataset.test)
    scores, tails = predictor.predict_tails(h=[14, 99], r=[3, 7], k=10)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu.graph import Graph
from ultra_tpu.models.nbfnet import UltraConfig, entity_nbfnet_score_all
from ultra_tpu.train.eval import precompute_relation_representations


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _topk_tails(params, cfg: UltraConfig, graph: Graph, rel_reprs_all, h, r, k: int):
    rel_repr = jnp.take(rel_reprs_all, r, axis=0)
    scores = entity_nbfnet_score_all(
        params["entity_model"], cfg.entity_model, graph, rel_repr, h, r
    )  # (B, V)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx, scores


class UltraPredictor:
    """Thread-compatible, jit-warm (h, r) -> top-k tail predictor."""

    def __init__(
        self,
        params,
        cfg: UltraConfig,
        graph: Graph,
        batch_size: int = 8,
        warm: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.graph = graph
        self.batch_size = batch_size
        self.rel_reprs = precompute_relation_representations(params, cfg, graph)
        if warm:
            h = jnp.zeros((batch_size,), jnp.int32)
            r = jnp.zeros((batch_size,), jnp.int32)
            jax.block_until_ready(
                _topk_tails(params, cfg, graph, self.rel_reprs, h, r, 10)
            )

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, split, cfg: Optional[UltraConfig] = None,
                        with_plans: Optional[bool] = None, **kw) -> "UltraPredictor":
        from ultra_tpu.data.kg import split_to_graph
        from ultra_tpu.utils.ckpt import load_model_checkpoint

        params = load_model_checkpoint(ckpt_path)
        from ultra_tpu.models.nbfnet import sum_only_aggregators

        cfg = cfg or UltraConfig()
        graph = split_to_graph(split, with_plans=with_plans,
                               v2_sort_slots=sum_only_aggregators(cfg))
        return cls(params, cfg, graph, **kw)

    def predict_tails(self, h: Sequence[int], r: Sequence[int], k: int = 10):
        """Returns (scores (N, k), tail ids (N, k)); batches internally."""
        h = np.asarray(h, dtype=np.int32)
        r = np.asarray(r, dtype=np.int32)
        assert h.shape == r.shape
        out_s, out_i = [], []
        for start in range(0, len(h), self.batch_size):
            hb = h[start : start + self.batch_size]
            rb = r[start : start + self.batch_size]
            n = len(hb)
            if n < self.batch_size:
                hb = np.pad(hb, (0, self.batch_size - n))
                rb = np.pad(rb, (0, self.batch_size - n))
            s, i, _ = _topk_tails(
                self.params, self.cfg, self.graph, self.rel_reprs,
                jnp.asarray(hb), jnp.asarray(rb), k,
            )
            out_s.append(np.asarray(s)[:n])
            out_i.append(np.asarray(i)[:n])
        return np.concatenate(out_s), np.concatenate(out_i)

    def predict_heads(self, t: Sequence[int], r: Sequence[int], k: int = 10):
        """Head prediction via the inverse relation (base_nbfnet.py:79-86)."""
        r = np.asarray(r, dtype=np.int32)
        return self.predict_tails(t, r + self.graph.num_relations // 2, k=k)

    def score_all(self, h: Sequence[int], r: Sequence[int]) -> np.ndarray:
        """(N, V) raw logits over every candidate tail."""
        h = np.asarray(h, dtype=np.int32)
        r = np.asarray(r, dtype=np.int32)
        outs = []
        for start in range(0, len(h), self.batch_size):
            hb = h[start : start + self.batch_size]
            rb = r[start : start + self.batch_size]
            n = len(hb)
            if n < self.batch_size:
                hb = np.pad(hb, (0, self.batch_size - n))
                rb = np.pad(rb, (0, self.batch_size - n))
            _, _, scores = _topk_tails(
                self.params, self.cfg, self.graph, self.rel_reprs,
                jnp.asarray(hb), jnp.asarray(rb), 1,
            )
            outs.append(np.asarray(scores)[:n])
        return np.concatenate(outs)
