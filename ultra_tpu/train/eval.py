"""Link-prediction evaluation: exhaustive all-node scoring, filtered ranking
and metrics — the TPU rewrite of /root/reference/script/run.py:121-226.

Device work (jitted, fixed shapes): score all tails for the t-direction and
the inverse-relation h-direction, compute filtered ranks against host-built
strict-negative masks. Host work: masks (int64 hashing), metric aggregation.

Under a device mesh, batches shard over the 'data' axis and rank vectors
gather with process-level allgather — see ultra_tpu/parallel.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu.graph import Graph
from ultra_tpu.models.nbfnet import UltraConfig, ultra_score_all
from ultra_tpu import tasks


@functools.partial(jax.jit, static_argnames=("cfg",))
def score_and_rank_batch(params, cfg: UltraConfig, graph: Graph, batch, t_mask, h_mask):
    """batch (B, 3) positives; masks (B, V) bool. Returns (t_rank, h_rank)."""
    h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
    num_direct = graph.num_relations // 2
    t_pred = ultra_score_all(params, cfg, graph, h, r_index=r)
    h_pred = ultra_score_all(
        params, cfg, graph, t, r_index=r + num_direct, query_r_index=r
    )
    t_rank = tasks.compute_ranking(t_pred, t, t_mask)
    h_rank = tasks.compute_ranking(h_pred, h, h_mask)
    return t_rank, h_rank


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rel_reprs_chunk(params, cfg: UltraConfig, graph: Graph, rels):
    from ultra_tpu.models.nbfnet import rel_nbfnet_apply

    return rel_nbfnet_apply(
        params["relation_model"], cfg.relation_model, graph.relation_graph, rels
    )


def precompute_relation_representations(params, cfg: UltraConfig, graph: Graph, chunk: int = 64):
    """(R, R, D) relation-graph outputs for every possible query relation.

    The relation model depends only on the query relation id (models.py:18-23),
    so exhaustive evaluation can run it R times total instead of once per
    batch — roughly halving per-batch GNN work. Chunked to bound memory.
    """
    r_total = graph.num_relations
    outs = []
    for start in range(0, r_total, chunk):
        rels = jnp.arange(start, start + chunk, dtype=jnp.int32) % r_total
        outs.append(_rel_reprs_chunk(params, cfg, graph, rels))
    return jnp.concatenate(outs, axis=0)[:r_total]  # (R, R, D)


def _score_and_rank_cached(
    params, cfg: UltraConfig, graph: Graph, rel_reprs_all, batch, t_mask, h_mask
):
    from ultra_tpu.models.nbfnet import entity_nbfnet_score_all

    h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
    num_direct = graph.num_relations // 2
    rel_repr = jnp.take(rel_reprs_all, r, axis=0)  # (B, R, D)
    heads = jnp.concatenate([h, t])
    rels = jnp.concatenate([r, r + num_direct])
    both = entity_nbfnet_score_all(
        params["entity_model"], cfg.entity_model, graph,
        jnp.concatenate([rel_repr, rel_repr], axis=0), heads, rels,
    )  # (2B, V)
    b = batch.shape[0]
    t_pred, h_pred = both[:b], both[b:]
    t_rank = tasks.compute_ranking(t_pred, t, t_mask)
    h_rank = tasks.compute_ranking(h_pred, h, h_mask)
    return t_rank, h_rank


def _eval_budget_ctx(eval_budget):
    """Trace-time eval stream budget INSIDE the jitted body, keyed by the
    static ``eval_budget`` argument — a module-global context around the
    jit call is NOT enough (the first caller to trace the shape poisons
    the cache for every later caller; bitten by exp_eval_decomp)."""
    import contextlib

    from ultra_tpu.ops import rspmm_pallas_v2 as _v2

    return _v2.stream_budget(eval_budget) if eval_budget else (
        contextlib.nullcontext()
    )


@functools.partial(jax.jit, static_argnames=("cfg", "eval_budget"))
def score_and_rank_batch_cached(
    params, cfg: UltraConfig, graph: Graph, rel_reprs_all, batch, t_mask,
    h_mask, eval_budget: Optional[int] = None,
):
    """score_and_rank_batch using precomputed (R, R, D) relation outputs.

    Both prediction directions run as ONE entity-model pass over a 2B-query
    batch (they share the graph): halves fixed per-call costs and doubles
    the kernel's feature width. ``eval_budget``: forward-only stream
    budget (unslice-if-it-fits, ROOFLINE round-5).
    """
    with _eval_budget_ctx(eval_budget):
        return _score_and_rank_cached(
            params, cfg, graph, rel_reprs_all, batch, t_mask, h_mask
        )


@functools.partial(jax.jit, static_argnames=("cfg", "eval_budget"))
def score_and_rank_group_cached(
    params, cfg: UltraConfig, graph: Graph, rel_reprs_all, batches, t_masks,
    h_masks, eval_budget: Optional[int] = None,
):
    """G batches per dispatch via lax.scan: batches (G, B, 3), masks
    (G, B, V). The tunneled TPU pays a large fixed cost per executable
    launch (measured ~0.4 s — it scales with the ~150 param/graph/plan
    input buffers, not with compute), so grouping G batches into one launch
    amortizes it G-fold. ``eval_budget``: see score_and_rank_batch_cached."""

    def body(carry, inp):
        batch, t_mask, h_mask = inp
        return carry, _score_and_rank_cached(
            params, cfg, graph, rel_reprs_all, batch, t_mask, h_mask
        )

    with _eval_budget_ctx(eval_budget):
        _, (t_rank, h_rank) = jax.lax.scan(body, 0, (batches, t_masks, h_masks))
    return t_rank, h_rank  # (G, B) each


def evaluate(
    params,
    cfg: UltraConfig,
    graph: Graph,
    test_triples: np.ndarray,  # (N, 3) target edges (no inverses)
    filtered_index: tasks.GraphIndex,  # filtering graph (run.py:263-291)
    batch_size: int = 8,
    metrics: Iterable[str] = ("mr", "mrr", "hits@1", "hits@3", "hits@10"),
    limit: Optional[int] = None,  # fast_test subsampling (pretrain.py:244-254)
    rng: Optional[np.random.Generator] = None,
    cache_relations: Optional[bool] = None,
) -> Dict[str, float]:
    """Full filtered evaluation; both prediction directions per triple
    (run.py:134-153). Tail-only variants via 'metric-tail' names.

    ``cache_relations`` precomputes the relation-graph outputs for all R
    query relations once (on by default when the eval set is large enough
    to amortize the R/chunk precompute passes).
    """
    trips = np.asarray(test_triples)
    if limit is not None and limit < len(trips):
        rng = rng or np.random.default_rng(0)
        trips = trips[rng.choice(len(trips), size=limit, replace=False)]

    return compute_metrics(
        metrics,
        *collect_rankings(
            params, cfg, graph, trips, filtered_index,
            batch_size=batch_size, cache_relations=cache_relations,
        ),
    )


def collect_rankings(
    params,
    cfg: UltraConfig,
    graph: Graph,
    trips: np.ndarray,
    filtered_index: tasks.GraphIndex,
    batch_size: int = 8,
    cache_relations: Optional[bool] = None,
    dispatch_group: int = 8,
):
    """Raw filtered rank / negative-count vectors for a triple list —
    the per-process unit of distributed evaluation (each process runs this
    on its shard, then rank vectors concat across hosts, run.py:155-186).
    Returns (ranking, num_negative, ranking_tail, num_negative_tail).

    ``dispatch_group``: batches per device launch on the cached path (one
    lax.scan inside jit) — amortizes the tunneled chip's per-launch fixed
    cost; host mask-building and transfers for group i+1 overlap device
    compute of group i (one-group pipeline)."""
    if cache_relations is None:
        cache_relations = len(trips) / batch_size > graph.num_relations / 64
    rel_reprs_all = (
        precompute_relation_representations(params, cfg, graph)
        if cache_relations
        else None
    )

    n = len(trips)
    rankings, num_negatives = [], []
    tail_rankings, num_tail_negs = [], []

    def submit_batch(batch):
        valid = len(batch)
        if valid < batch_size:  # pad last batch, drop padded results
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], batch_size - valid, axis=0)]
            )
        t_mask, h_mask = tasks.strict_negative_mask(filtered_index, batch)
        return batch, t_mask, h_mask, valid

    def collect(pending):
        # materialize the previous launch's device results (blocks)
        t_rank, h_rank, t_masks, h_masks, valids = pending
        t_rank, h_rank = np.asarray(t_rank), np.asarray(h_rank)
        for i, valid in enumerate(valids):
            tr, hr = t_rank[i][:valid], h_rank[i][:valid]
            rankings.extend([tr, hr])
            num_negatives.extend(
                [t_masks[i].sum(axis=-1)[:valid], h_masks[i].sum(axis=-1)[:valid]]
            )
            tail_rankings.append(tr)
            num_tail_negs.append(t_masks[i].sum(axis=-1)[:valid])

    batch_starts = list(range(0, n, batch_size))
    pending = None
    if rel_reprs_all is not None:
        for gstart in range(0, len(batch_starts), dispatch_group):
            group = [
                submit_batch(trips[s : s + batch_size])
                for s in batch_starts[gstart : gstart + dispatch_group]
            ]
            while len(group) < dispatch_group:  # keep one jit shape
                b, tm, hm, _ = group[-1]
                group.append((b, tm, hm, 0))
            batches = np.stack([b for b, _, _, _ in group])
            t_masks = np.stack([tm for _, tm, _, _ in group])
            h_masks = np.stack([hm for _, _, hm, _ in group])
            valids = [v for _, _, _, v in group]
            from ultra_tpu.ops import rspmm_pallas_v2 as _v2

            t_rank, h_rank = score_and_rank_group_cached(
                params, cfg, graph, rel_reprs_all,
                jnp.asarray(batches), jnp.asarray(t_masks), jnp.asarray(h_masks),
                eval_budget=_v2.EVAL_SLICE_BYTES,
            )
            if pending is not None:
                collect(pending)
            pending = (t_rank, h_rank, t_masks, h_masks, valids)
    else:
        for s in batch_starts:
            batch, t_mask, h_mask, valid = submit_batch(trips[s : s + batch_size])
            from ultra_tpu.ops import rspmm_pallas_v2 as _v2

            with _v2.stream_budget(_v2.EVAL_SLICE_BYTES):
                # non-cached path: score_and_rank_batch is not jitted at
                # this level, so the context wraps the actual trace
                t_rank, h_rank = score_and_rank_batch(
                    params, cfg, graph,
                    jnp.asarray(batch), jnp.asarray(t_mask), jnp.asarray(h_mask),
                )
            if pending is not None:
                collect(pending)
            pending = (t_rank[None], h_rank[None], t_mask[None], h_mask[None], [valid])
    if pending is not None:
        collect(pending)

    return (
        np.concatenate(rankings),
        np.concatenate(num_negatives),
        np.concatenate(tail_rankings),
        np.concatenate(num_tail_negs),
    )


def compute_metrics(metrics, ranking, num_negative, ranking_t=None, num_negative_t=None):
    """mr / mrr / hits@k / unbiased hits@k_sample / *-tail (run.py:188-226)."""
    out = {}
    for metric in metrics:
        if metric.endswith("-tail"):
            name = metric[: -len("-tail")]
            _rank, _neg = ranking_t, num_negative_t
        else:
            name, _rank, _neg = metric, ranking, num_negative
        _rank = _rank.astype(np.float64)
        if name == "mr":
            score = _rank.mean()
        elif name == "mrr":
            score = (1.0 / _rank).mean()
        elif name.startswith("hits@"):
            values = name[5:].split("_")
            threshold = int(values[0])
            if len(values) > 1:
                num_sample = int(values[1])
                # unbiased estimation: P(<=i false positives among num_sample-1)
                fp_rate = (_rank - 1) / _neg
                score = 0.0
                for i in range(threshold):
                    num_comb = (
                        math.factorial(num_sample - 1)
                        / math.factorial(i)
                        / math.factorial(num_sample - i - 1)
                    )
                    score = score + num_comb * (fp_rate**i) * (1 - fp_rate) ** (
                        num_sample - i - 1
                    )
                score = float(np.mean(score))
            else:
                score = float((_rank <= threshold).mean())
        else:
            raise ValueError(f"unknown metric {name!r}")
        out[metric] = float(score)
    return out
