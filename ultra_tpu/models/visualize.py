"""Path interpretation: gradient x beam-search visualization of the most
important paths behind a prediction — port of base_nbfnet.py:156-263.

Device side: a differentiable bellman-ford with per-layer edge weights
(the un-fused rspmm path is plain jnp, so edge-weight gradients come from
autodiff — mirroring the reference's ``separate_grad`` fallback,
base_nbfnet.py:107-108). Host side: beam search over the per-layer edge
gradients (numpy; single query, interpretation tooling not a hot path).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ultra_tpu.graph import Graph
from ultra_tpu.models.layers import (
    ConvConfig, _pna_features, layer_relation, linear, layer_norm, _activation,
)
from ultra_tpu.models.nbfnet import mlp_apply, scatter_boundary, rel_nbfnet_apply
from ultra_tpu.ops.rspmm import _rspmm_xla


def _rotate_messages(graph: Graph, relation, input):
    """Per-edge RotatE messages (complex rotation), unweighted (E, B, D)."""
    x_e = jnp.take(input, graph.edge_index[1], axis=0)
    r_e = jnp.take(relation, graph.edge_type, axis=0)
    d = x_e.shape[-1] // 2
    x_re, x_im = x_e[..., :d], x_e[..., d:]
    r_re, r_im = r_e[..., :d], r_e[..., d:]
    return jnp.concatenate(
        [x_re * r_re - x_im * r_im, x_re * r_im + x_im * r_re], axis=-1
    )


def _conv_unfused(params, cfg: ConvConfig, graph: Graph, input, boundary, edge_weight,
                  relation_input=None, query=None):
    """Differentiable conv using plain-XLA segment ops (no custom VJP),
    taking an explicit per-layer edge weight vector. All message funcs and
    aggregators (mirroring the reference's ``separate_grad`` fallback,
    layers.py:135-181 — whose min/max autograd routes ties to a single
    argmax, as XLA's does)."""
    relation = layer_relation(params, cfg, query=query, relation_input=relation_input)

    def spmm(sum_op, rel=relation, x=input):
        if cfg.message_func == "rotate":
            msg = _rotate_messages(graph, rel, x)
            if sum_op == "add":
                return jax.ops.segment_sum(
                    msg * edge_weight[:, None, None], graph.edge_index[0],
                    num_segments=graph.num_nodes,
                )
            live = edge_weight != 0.0
            fill = jnp.inf if sum_op == "min" else -jnp.inf
            msg = jnp.where(live[:, None, None], msg * edge_weight[:, None, None], fill)
            op = jax.ops.segment_min if sum_op == "min" else jax.ops.segment_max
            return op(msg, graph.edge_index[0], num_segments=graph.num_nodes)
        mul = {"distmult": "mul", "transe": "add"}[cfg.message_func]
        return _rspmm_xla(
            graph.edge_index, graph.edge_type, edge_weight, rel, x,
            graph.num_nodes, sum_op, mul,
        )

    if cfg.aggregate_func == "sum":
        update = spmm("add") + boundary
    elif cfg.aggregate_func == "mean":
        live = (edge_weight != 0.0).astype(input.dtype)
        deg = jax.ops.segment_sum(
            live, graph.edge_index[0], num_segments=graph.num_nodes
        )[:, None, None] + 1.0
        update = (spmm("add") + boundary) / deg
    elif cfg.aggregate_func == "max":
        update = jnp.maximum(spmm("max"), boundary)
    elif cfg.aggregate_func == "pna":
        live = (edge_weight != 0.0).astype(input.dtype)
        deg = jax.ops.segment_sum(
            live, graph.edge_index[0], num_segments=graph.num_nodes
        )[:, None, None] + 1.0
        if cfg.message_func == "rotate":
            msg = _rotate_messages(graph, relation, input)
            sq_sum = jax.ops.segment_sum(
                jnp.square(msg) * edge_weight[:, None, None], graph.edge_index[0],
                num_segments=graph.num_nodes,
            )
        else:
            sq_sum = spmm("add", rel=jnp.square(relation), x=jnp.square(input))
        update = _pna_features(
            spmm("add"), sq_sum, spmm("max"), spmm("min"), boundary, deg
        )
    else:
        raise ValueError(f"unknown aggregate_func {cfg.aggregate_func!r}")
    output = linear(params["linear"], jnp.concatenate([input, update], axis=-1))
    if cfg.layer_norm:
        output = layer_norm(params["layer_norm"], output)
    return _activation(cfg.activation, output)


def edge_gradients(params, cfg, graph: Graph, h_index: int, t_index: int, r_index: int):
    """Per-layer d score(t | h, r) / d edge_weight — the reference's
    autograd.grad over separate per-layer weights (base_nbfnet.py:160-168)."""
    rel_repr = rel_nbfnet_apply(
        params["relation_model"], cfg.relation_model, graph.relation_graph,
        jnp.asarray([r_index]),
    )  # (1, R, D)
    ecfg = cfg.entity_model
    n_layers = len(params["entity_model"]["layers"])
    base_w = graph.edge_weight

    def score_fn(layer_weights):
        query = rel_repr[jnp.arange(1), jnp.asarray([r_index])]  # (1, D)
        boundary = scatter_boundary(jnp.asarray([h_index]), query, graph.num_nodes)
        layer_input = boundary
        for i, layer_params in enumerate(params["entity_model"]["layers"]):
            hidden = _conv_unfused(
                layer_params, ecfg.conv_config(i), graph, layer_input, boundary,
                layer_weights[i], relation_input=rel_repr,
            )
            if ecfg.short_cut and hidden.shape == layer_input.shape:
                hidden = hidden + layer_input
            layer_input = hidden
        node_query = jnp.broadcast_to(query[None], (graph.num_nodes,) + query.shape)
        feature = jnp.concatenate([layer_input, node_query], axis=-1)
        score = mlp_apply(params["entity_model"]["mlp"], feature)[..., 0]  # (V, 1)
        return score[t_index, 0]

    weights = [base_w for _ in range(n_layers)]
    grads = jax.grad(lambda ws: score_fn(ws))(weights)
    return [np.asarray(g) for g in grads]


def beam_search_distance(
    edge_index: np.ndarray, edge_type: np.ndarray, edge_grads: List[np.ndarray],
    num_nodes: int, h_index: int, t_index: int, num_beam: int = 10,
):
    """Top-k path distances via per-layer beam search over edge gradients
    (numpy port of base_nbfnet.py:174-240)."""
    inputs = np.full((num_nodes, num_beam), -np.inf)
    inputs[h_index, 0] = 0.0
    edge_mask = edge_index[0] != t_index

    distances, back_edges = [], []
    for grad in edge_grads:
        node_in = edge_index[0][edge_mask]
        node_out = edge_index[1][edge_mask]
        relation = edge_type[edge_mask]
        g = grad[: edge_index.shape[1]][edge_mask]

        # per-edge beam messages
        message = inputs[node_in] + g[:, None]  # (E', K)
        distance = np.full((num_nodes, num_beam), -np.inf)
        back_edge = np.zeros((num_nodes, num_beam, 4), dtype=np.int64)

        order = np.argsort(node_out, kind="stable")
        for t in np.unique(node_out):
            sel = order[np.searchsorted(node_out[order], t): np.searchsorted(node_out[order], t, side="right")]
            msgs, srcs = [], []
            for e in sel:
                for kk in range(num_beam):
                    if np.isfinite(message[e, kk]):
                        msgs.append(message[e, kk])
                        srcs.append((node_in[e], node_out[e], relation[e], kk))
            if not msgs:
                continue
            msgs = np.asarray(msgs)
            srcs_arr = np.asarray(srcs)
            # deduplicate messages from the same (edge, prev_rank)
            _, first = np.unique(
                srcs_arr[:, [0, 1, 2, 3]], axis=0, return_index=True
            )
            msgs = msgs[np.sort(first)]
            srcs_arr = srcs_arr[np.sort(first)]
            top = np.argsort(-msgs, kind="stable")[:num_beam]
            distance[t, : len(top)] = msgs[top]
            back_edge[t, : len(top)] = srcs_arr[top]

        distances.append(distance)
        back_edges.append(back_edge)
        inputs = distance
    return distances, back_edges


def topk_average_length(distances, back_edges, t_index: int, k: int = 10):
    """Backtrack beams into explicit paths ranked by average edge gradient
    (base_nbfnet.py:242-263)."""
    paths, average_lengths = [], []
    for i in range(len(distances)):
        ranks = np.argsort(-distances[i][t_index], kind="stable")
        for rank in ranks[:k]:
            d = distances[i][t_index, rank]
            if not np.isfinite(d):
                break
            h, t, r, prev_rank = back_edges[i][t_index, rank]
            path = [(int(h), int(t), int(r))]
            for j in range(i - 1, -1, -1):
                h, t, r, prev_rank = back_edges[j][int(h), int(prev_rank)]
                path.append((int(h), int(t), int(r)))
            paths.append(path[::-1])
            average_lengths.append(float(d) / len(path))
    if paths:
        pairs = sorted(zip(average_lengths, paths), key=lambda x: -x[0])[:k]
        average_lengths, paths = zip(*pairs)
    return list(paths), list(average_lengths)


def visualize(params, cfg, graph: Graph, h_index: int, t_index: int, r_index: int,
              num_beam: int = 10, path_topk: int = 10):
    """Top paths explaining score(h, r -> t) with importance weights."""
    grads = edge_gradients(params, cfg, graph, h_index, t_index, r_index)
    ei = np.asarray(graph.edge_index)
    et = np.asarray(graph.edge_type)
    live = np.asarray(graph.edge_weight) != 0
    grads = [g * live for g in grads]
    distances, back_edges = beam_search_distance(
        ei, et, grads, graph.num_nodes, h_index, t_index, num_beam
    )
    return topk_average_length(distances, back_edges, t_index, path_topk)
