"""Independent PyTorch oracle of the ULTRA forward pass, used to validate the
JAX implementation numerically (per-layer and end-to-end) with the real
shipped checkpoints.

This is a from-scratch torch implementation of the *mathematical contract*
(fused rspmm semantics + NBFNet recursions) — deliberately written with plain
dense torch ops (index_add_, index_select) and batch-major layout like the
reference, so agreement between this and the node-major JAX stack is a strong
independent check. No code is shared with /root/reference (which cannot run
here anyway: torch_geometric is not installed).
"""

import numpy as np
import torch


def rspmm_oracle(edge_index, edge_type, edge_weight, relation, x, num_nodes, sum_op, mul_op):
    """out[dst] = agg_e w_e * op(rel[type_e], x[src_e]); batch-major (B, V, D).

    relation: (B, R, D), x: (B, V, D) -> (B, V, D)
    """
    dst = torch.as_tensor(edge_index[0], dtype=torch.long)
    src = torch.as_tensor(edge_index[1], dtype=torch.long)
    et = torch.as_tensor(edge_type, dtype=torch.long)
    w = torch.as_tensor(edge_weight)
    live = w != 0
    dst, src, et, w = dst[live], src[live], et[live], w[live]

    rel_e = relation[:, et]  # (B, E, D)
    x_e = x[:, src]
    msg = rel_e * x_e if mul_op == "mul" else rel_e + x_e
    msg = msg * w[None, :, None]

    b, _, d = x.shape
    if sum_op == "add":
        out = torch.zeros(b, num_nodes, d, dtype=x.dtype)
        out.index_add_(1, dst, msg)
        return out
    ident = float("inf") if sum_op == "min" else float("-inf")
    out = torch.full((b, num_nodes, d), ident, dtype=x.dtype)
    op = torch.minimum if sum_op == "min" else torch.maximum
    # sequential per-edge reduce (slow, exact)
    for e in range(dst.shape[0]):
        out[:, dst[e]] = op(out[:, dst[e]], msg[:, e])
    return out


def conv_oracle(layer, graph, input, boundary, relation, message_func="distmult", aggregate_func="sum"):
    """One GeneralizedRelationalConv round, batch-major (B, V, D).

    layer: dict of numpy params (ultra_tpu converted layout).
    relation: (B, R, D) per-layer relation features (already projected).
    """
    mul = {"distmult": "mul", "transe": "add"}[message_func]
    ei, et, ew, v = graph
    if aggregate_func == "sum":
        update = rspmm_oracle(ei, et, ew, relation, input, v, "add", mul) + boundary
    elif aggregate_func == "max":
        update = torch.maximum(rspmm_oracle(ei, et, ew, relation, input, v, "max", mul), boundary)
    else:
        raise NotImplementedError(aggregate_func)

    w = torch.as_tensor(np.asarray(layer["linear"]["w"]))  # (in, out)
    bias = torch.as_tensor(np.asarray(layer["linear"]["b"]))
    out = torch.cat([input, update], dim=-1) @ w + bias
    if "layer_norm" in layer:
        ln = layer["layer_norm"]
        out = torch.nn.functional.layer_norm(
            out,
            (out.shape[-1],),
            torch.as_tensor(np.asarray(ln["scale"])),
            torch.as_tensor(np.asarray(ln["bias"])),
        )
    return torch.relu(out)


def project_relations_oracle(layer, relation_repr):
    """2-layer MLP relation projection (layers.py:60-64)."""
    p = layer["relation_projection"]
    h = torch.relu(relation_repr @ torch.as_tensor(np.asarray(p["w1"])) + torch.as_tensor(np.asarray(p["b1"])))
    return h @ torch.as_tensor(np.asarray(p["w2"])) + torch.as_tensor(np.asarray(p["b2"]))


def mlp_oracle(mlp_params, x):
    for i, p in enumerate(mlp_params):
        x = x @ torch.as_tensor(np.asarray(p["w"])) + torch.as_tensor(np.asarray(p["b"]))
        if i + 1 < len(mlp_params):
            x = torch.relu(x)
    return x


def rel_nbfnet_oracle(params, rel_graph, query_rels, dim=64, short_cut=True):
    """(B, R, D) relation representations; boundary = ones on query node."""
    b = len(query_rels)
    _, _, _, num_rel_nodes = rel_graph
    boundary = torch.zeros(b, num_rel_nodes, dim)
    boundary[torch.arange(b), torch.as_tensor(query_rels, dtype=torch.long)] = 1.0
    hidden = boundary
    for layer in params["layers"]:
        rel = torch.as_tensor(np.asarray(layer["relation"]))[None].expand(b, -1, -1)
        new = conv_oracle(layer, rel_graph, hidden, boundary, rel)
        if short_cut:
            new = new + hidden
        hidden = new
    return hidden


def entity_nbfnet_oracle(params, graph, rel_repr, h_index, r_index, short_cut=True):
    """(B, V, 2D) features + (B, V) scores over all tails."""
    b = len(h_index)
    _, _, _, v = graph
    query = rel_repr[torch.arange(b), torch.as_tensor(r_index, dtype=torch.long)]  # (B, D)
    boundary = torch.zeros(b, v, query.shape[-1])
    boundary[torch.arange(b), torch.as_tensor(h_index, dtype=torch.long)] = query
    hidden = boundary
    per_layer = []
    for layer in params["layers"]:
        rel = project_relations_oracle(layer, rel_repr)  # (B, R, D)
        new = conv_oracle(layer, graph, hidden, boundary, rel)
        if short_cut:
            new = new + hidden
        hidden = new
        per_layer.append(hidden)
    node_query = query[:, None].expand(-1, v, -1)
    feature = torch.cat([hidden, node_query], dim=-1)
    score = mlp_oracle(params["mlp"], feature).squeeze(-1)
    return score, per_layer


def ultra_oracle(params, graph, rel_graph, h_index, r_index):
    rel_repr = rel_nbfnet_oracle(params["relation_model"], rel_graph, r_index)
    score, per_layer = entity_nbfnet_oracle(
        params["entity_model"], graph, rel_repr, h_index, r_index
    )
    return score, rel_repr, per_layer
