"""NBFNet-style models: RelNBFNet (on the relation graph), EntityNBFNet (on
the entity graph) and QueryNBFNet (UltraQuery's entity reasoner), plus the
Ultra composition root.

Functional JAX re-design of /root/reference/ultra/{models.py,base_nbfnet.py}.
Activations are node-major (V, B, D); batch ``(B, K, 3)`` triple layout,
scoring MLP, tail-conversion and boundary construction match the reference
exactly so the shipped checkpoints transfer numerically.

Easy-edge removal (training-time dropout of the batch edges,
base_nbfnet.py:54-77) is done OUTSIDE the jitted step by the data pipeline
(ultra_tpu/tasks.py:easy_edge_weights) and arrives here as an edge-weight
vector — static shapes, no retracing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ultra_tpu.graph import Graph
from ultra_tpu.models.layers import ConvConfig, conv_apply, linear


@struct.dataclass
class NBFNetConfig:
    input_dim: int = 64
    hidden_dims: Tuple[int, ...] = (64, 64, 64, 64, 64, 64)
    num_relation: int = 4  # 4 meta-relations for RelNBFNet; unused for Entity
    message_func: str = "distmult"
    aggregate_func: str = "sum"
    short_cut: bool = True
    layer_norm: bool = True
    activation: str = "relu"
    concat_hidden: bool = False
    num_mlp_layer: int = 2
    remove_one_hop: bool = False
    project_relations: bool = False
    rspmm_backend: str = "auto"
    edge_axis: Optional[str] = None  # mesh axis for edge-partitioned rspmm
    sharded_plans: bool = False  # graph carries per-shard stacked pallas plans
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for kernel operands
    # Pallas kernel matmul precision: None = fast MXU bf16 passes,
    # "highest" = exact f32 (for parity runs against the reference kernels)
    precision: Optional[str] = None
    # roll homogeneous layer stacks into one lax.scan: ~L-fold smaller traces
    # and compile times (important over the remote-compile tunnel); falls back
    # to the unrolled loop for heterogeneous dims or concat_hidden
    scan_layers: bool = True
    # rematerialize each conv layer in the backward pass: activations are
    # O(V*B*D) per layer, so remat trades ~2x flops for 6x less live memory
    # on large graphs (the TPU analog of the reference's O(V*d) memory
    # argument, layers.py:184-186)
    remat: bool = False

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.input_dim,) + tuple(self.hidden_dims)

    def conv_config(self, i: int) -> ConvConfig:
        return ConvConfig(
            input_dim=self.dims[i],
            output_dim=self.dims[i + 1],
            num_relation=self.num_relation,
            message_func=self.message_func,
            aggregate_func=self.aggregate_func,
            layer_norm=self.layer_norm,
            activation=self.activation,
            dependent=False,
            project_relations=self.project_relations,
            rspmm_backend=self.rspmm_backend,
            edge_axis=self.edge_axis,
            sharded_plans=self.sharded_plans,
            compute_dtype=self.compute_dtype,
            precision=self.precision,
        )


@struct.dataclass
class UltraConfig:
    relation_model: NBFNetConfig = struct.field(
        default_factory=lambda: NBFNetConfig(num_relation=4)
    )
    entity_model: NBFNetConfig = struct.field(
        default_factory=lambda: NBFNetConfig(num_relation=1, project_relations=True)
    )


def sum_only_aggregators(cfg: UltraConfig) -> bool:
    """True when no sub-model needs the min/max rspmm kernels (sum/mean
    aggregation only — the flagship ultra_3g/4g configs). Such models can
    attach sort_slots=True v2 plans, whose lower per-chunk distinct-type
    floor lets the planner's table-width auto-escalation beat the global
    relation table on uniform histograms (rspmm_pallas.attach_plans)."""
    return all(
        m.aggregate_func in ("sum", "mean")
        for m in (cfg.relation_model, cfg.entity_model)
    )


def scatter_boundary(h_index: jax.Array, query: jax.Array, num_nodes: int) -> jax.Array:
    """(V, B, D) boundary: query[b] scatter-added onto node h_index[b].

    Matches the reference's ``boundary.scatter_add_`` (models.py:139-141) —
    add, not set, so duplicate heads accumulate identically.
    """
    b, d = query.shape
    boundary = jnp.zeros((num_nodes, b, d), dtype=query.dtype)
    return boundary.at[h_index, jnp.arange(b)].add(query)


def _layers_homogeneous(params, cfg: NBFNetConfig) -> bool:
    layers = params["layers"]
    if len(layers) < 2 or len(set(cfg.dims)) != 1:
        return False
    t0 = jax.tree.structure(layers[0])
    s0 = [jnp.shape(l) for l in jax.tree.leaves(layers[0])]
    return all(
        jax.tree.structure(l) == t0
        and [jnp.shape(x) for x in jax.tree.leaves(l)] == s0
        for l in layers[1:]
    )


def bellmanford(
    params: dict,
    cfg: NBFNetConfig,
    graph: Graph,
    boundary: jax.Array,  # (V, B, D)
    query: jax.Array,  # (B, D)
    relation_input: Optional[jax.Array] = None,  # (B, R, D) for project_relations
):
    """Shared Bellman-Ford iteration (base_nbfnet.py:88-128): run every conv
    layer with the *original* boundary condition, residual short-cuts between
    equal-width layers. Returns all hidden states (for concat_hidden).

    Homogeneous layer stacks (the flagship 6x64 configs) run as one lax.scan
    over stacked parameters — one conv trace instead of L.
    """
    apply_fn = conv_apply
    if cfg.remat:
        apply_fn = jax.checkpoint(conv_apply, static_argnums=(1,), policy=None)

    if cfg.scan_layers and _layers_homogeneous(params, cfg):
        ccfg = cfg.conv_config(0)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

        def body(layer_input, layer_params):
            hidden = apply_fn(
                layer_params, ccfg, graph, layer_input, boundary,
                query=query, relation_input=relation_input,
            )
            if cfg.short_cut:
                hidden = hidden + layer_input
            return hidden, hidden

        _, ys = jax.lax.scan(body, boundary, stacked)
        return [ys[i] for i in range(len(params["layers"]))]

    layer_input = boundary
    hiddens = []
    for i, layer_params in enumerate(params["layers"]):
        hidden = apply_fn(
            layer_params,
            cfg.conv_config(i),
            graph,
            layer_input,
            boundary,
            query=query,
            relation_input=relation_input,
        )
        if cfg.short_cut and hidden.shape == layer_input.shape:
            hidden = hidden + layer_input
        hiddens.append(hidden)
        layer_input = hidden
    return hiddens


def mlp_apply(params: Sequence[dict], x: jax.Array) -> jax.Array:
    """ReLU MLP: Linear-ReLU-...-Linear (models.py:122-128)."""
    for i, p in enumerate(params):
        x = linear(p, x)
        if i + 1 < len(params):
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# RelNBFNet — NBFNet over the graph of relations (models.py:32-102)
# ---------------------------------------------------------------------------


def rel_nbfnet_apply(params, cfg: NBFNetConfig, rel_graph: Graph, query_rels: jax.Array):
    """query_rels: (B,) int relation ids. Returns (B, R, D) relation states.

    Boundary = all-ones D-vector on the query-relation node (models.py:58-66).
    """
    b = query_rels.shape[0]
    d = cfg.input_dim
    query = jnp.ones((b, d), dtype=jnp.float32)
    boundary = scatter_boundary(query_rels, query, rel_graph.num_nodes)
    hiddens = bellmanford(params, cfg, rel_graph, boundary, query)
    if cfg.concat_hidden:
        node_query = jnp.broadcast_to(
            query[None], (rel_graph.num_nodes,) + query.shape
        )
        output = jnp.concatenate(hiddens + [node_query], axis=-1)
        output = mlp_apply(params["mlp"], output)
    else:
        output = hiddens[-1]
    return jnp.swapaxes(output, 0, 1)  # (B, R, D)


# ---------------------------------------------------------------------------
# EntityNBFNet — NBFNet over the entity graph (models.py:105-209)
# ---------------------------------------------------------------------------


def negative_sample_to_tail(h_index, t_index, r_index, num_direct_rel):
    """Convert head-corruption triples to tail prediction under the inverse
    relation (base_nbfnet.py:79-86)."""
    is_t_neg = jnp.all(h_index == h_index[:, :1], axis=-1, keepdims=True)
    new_h = jnp.where(is_t_neg, h_index, t_index)
    new_t = jnp.where(is_t_neg, t_index, h_index)
    new_r = jnp.where(is_t_neg, r_index, r_index + num_direct_rel)
    return new_h, new_t, new_r


def entity_nbfnet_features(
    params, cfg: NBFNetConfig, graph: Graph, relation_representations, h_index, r_index
):
    """Bellman-Ford on the entity graph for per-(h, r) queries.

    h_index, r_index: (B,). Returns (V, B, feature_dim) node features
    ([last_hidden ‖ node_query], models.py:165-170).
    """
    b = h_index.shape[0]
    # query = relation_representations[b, r_index[b]]  (models.py:131-135)
    query = relation_representations[jnp.arange(b), r_index]  # (B, D)
    boundary = scatter_boundary(h_index, query, graph.num_nodes)
    hiddens = bellmanford(
        params, cfg, graph, boundary, query, relation_input=relation_representations
    )
    node_query = jnp.broadcast_to(query[None], (graph.num_nodes,) + query.shape)
    if cfg.concat_hidden:
        feature = jnp.concatenate(hiddens + [node_query], axis=-1)
    else:
        feature = jnp.concatenate([hiddens[-1], node_query], axis=-1)
    return feature  # (V, B, F)


def entity_nbfnet_apply(
    params,
    cfg: NBFNetConfig,
    graph: Graph,
    relation_representations: jax.Array,  # (B, R, D)
    batch: jax.Array,  # (B, K, 3) int (h, t, r)
):
    """Score each candidate triple. Returns (B, K) logits (models.py:177-209).

    NOTE: training-time easy-edge removal is the caller's responsibility
    (pass a graph whose edge weights already zero the batch edges).
    """
    h_index, t_index, r_index = batch[..., 0], batch[..., 1], batch[..., 2]
    h_index, t_index, r_index = negative_sample_to_tail(
        h_index, t_index, r_index, num_direct_rel=graph.num_relations // 2
    )
    feature = entity_nbfnet_features(
        params, cfg, graph, relation_representations, h_index[:, 0], r_index[:, 0]
    )  # (V, B, F)
    b = feature.shape[1]
    # gather tail candidates: feature[t_index[b,k], b] -> (B, K, F)
    feature = feature[t_index, jnp.arange(b)[:, None]]
    score = mlp_apply(params["mlp"], feature)[..., 0]  # (B, K)
    return score


def entity_nbfnet_score_all(
    params, cfg: NBFNetConfig, graph: Graph, relation_representations, h_index, r_index
):
    """Score ALL nodes as tails for per-row (h, r) queries: (B, V) logits.

    Equivalent to entity_nbfnet_apply with t_index = arange(V) but skips the
    (B, V, F) gather. Used by the evaluation pipeline (tasks.all_negative
    t-batch) and by UltraQuery projections.
    """
    feature = entity_nbfnet_features(
        params, cfg, graph, relation_representations, h_index, r_index
    )  # (V, B, F)
    score = mlp_apply(params["mlp"], feature)[..., 0]  # (V, B)
    return score.T


# ---------------------------------------------------------------------------
# QueryNBFNet — UltraQuery's entity reasoner (models.py:212-275)
# ---------------------------------------------------------------------------


def query_nbfnet_apply(
    params,
    cfg: NBFNetConfig,
    graph: Graph,
    node_features: jax.Array,  # (V, B, D) precomputed fuzzy-set boundary
    relation_representations: jax.Array,  # (B, R, D)
    query: jax.Array,  # (B, D)
):
    """Returns (B, V) scores over all nodes (models.py:258-275)."""
    hiddens = bellmanford(
        params, cfg, graph, node_features, query, relation_input=relation_representations
    )
    node_query = jnp.broadcast_to(query[None], (graph.num_nodes,) + query.shape)
    if cfg.concat_hidden:
        feature = jnp.concatenate(hiddens + [node_query], axis=-1)
    else:
        feature = jnp.concatenate([hiddens[-1], node_query], axis=-1)
    score = mlp_apply(params["mlp"], feature)[..., 0]  # (V, B)
    return score.T


# ---------------------------------------------------------------------------
# Ultra — composition root (models.py:7-26)
# ---------------------------------------------------------------------------


def ultra_apply(params, cfg: UltraConfig, graph: Graph, batch: jax.Array):
    """batch: (B, K, 3). Returns (B, K) scores."""
    query_rels = batch[:, 0, 2]
    rel_repr = rel_nbfnet_apply(
        params["relation_model"], cfg.relation_model, graph.relation_graph, query_rels
    )
    return entity_nbfnet_apply(
        params["entity_model"], cfg.entity_model, graph, rel_repr, batch
    )


def ultra_score_all(
    params, cfg: UltraConfig, graph: Graph, h_index, *, r_index, query_r_index=None
):
    """(B, V) all-tail scores for (h, r) rows — eval fast path.

    ``query_r_index`` conditions the relation model; it defaults to
    ``r_index`` but differs for head-corruption batches, where the reference
    conditions on the *original* relation (``batch[:, 0, 2]``, models.py:22)
    while the entity model queries the inverse relation ``r + R/2``
    (base_nbfnet.py:79-86). Head prediction for (t, r) is then
    ``ultra_score_all(h_index=t, r_index=r + R/2, query_r_index=r)``.
    """
    if query_r_index is None:
        query_r_index = r_index
    rel_repr = rel_nbfnet_apply(
        params["relation_model"], cfg.relation_model, graph.relation_graph, query_r_index
    )
    return entity_nbfnet_score_all(
        params["entity_model"], cfg.entity_model, graph, rel_repr, h_index, r_index
    )
