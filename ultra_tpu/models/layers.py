"""Generalized relational convolution — the single GNN layer of the framework.

Functional JAX re-design of the reference's ``GeneralizedRelationalConv``
(/root/reference/ultra/layers.py:12-241). One pure function, parameters as a
pytree dict, static hyperparameters in :class:`ConvConfig`.

Differences from the reference (by design):

- Node-major activations ``(V, B, D)`` — no (bs, V, d) <-> (V, bs*d)
  transposes around the kernel (``layers.py:190-192`` in the reference).
- Only the *fused* execution path exists; the un-fused per-edge PyG fallback
  (``layers.py:135-181``) is reproduced as a test oracle in tests/, not as a
  runtime path, because the fused path is the operative semantics for every
  shipped config.
- Easy-edge removal / traversal dropout arrive as edge weights of 0, not as
  sliced edge arrays (static shapes).

Parameter pytree (see also utils/torch_ckpt.py for the .pth converter):

  {
    "linear":   {"w": (in, out), "b": (out,)},         # torch stores (out, in)
    "layer_norm": {"scale": (out,), "bias": (out,)},   # optional
    "relation": (R, D),                                 # embedding variant
    "relation_projection": {"w1","b1","w2","b2"},       # project_relations variant
    "relation_linear": {"w","b"},                       # dependent variant
  }
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ultra_tpu.graph import Graph
from ultra_tpu.ops.rspmm import rspmm_from_graph, degree

EPS = 1e-6  # PNA std clamp, layers.py:14

logger = logging.getLogger(__name__)


@struct.dataclass
class ConvConfig:
    input_dim: int = 64
    output_dim: int = 64
    num_relation: int = 4
    message_func: str = "distmult"  # distmult | transe | rotate
    aggregate_func: str = "sum"  # sum | mean | max | pna
    layer_norm: bool = True
    activation: str = "relu"
    dependent: bool = False
    project_relations: bool = False
    rspmm_backend: str = "auto"
    # SPMD: name of the mesh axis over which graph edges are sharded. When
    # set, rspmm results are partial per-shard aggregates and are combined
    # with a psum/pmax/pmin over this axis (inside shard_map).
    edge_axis: str | None = None
    # under edge sharding, set when the graph carries per-shard (stacked)
    # pallas plans: the kernel then runs on each shard's local plan and the
    # psum over edge_axis combines the partials
    sharded_plans: bool = False
    # cast rspmm operands (node states + relation table) to this dtype:
    # "bfloat16" halves the kernel's gather traffic; accumulation stays f32
    compute_dtype: str | None = None
    # Pallas MXU matmul precision: None = fast bf16 passes (default MXU
    # behavior for f32 operands), "highest" = exact f32 (~3-6x matmul cost)
    # for bit-level parity with the reference's f32 CPU/CUDA kernels
    precision: str | None = None


_MESSAGE2MUL = {"transe": "add", "distmult": "mul"}  # layers.py:16-19


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pextreme(x, axis, is_min):
    return jax.lax.pmin(x, axis) if is_min else jax.lax.pmax(x, axis)


def _pextreme_fwd(x, axis, is_min):
    y = _pextreme(x, axis, is_min)
    return y, (x, y)


def _pextreme_bwd(axis, is_min, res, g):
    # jax has no differentiation rule for pmax/pmin; route the cotangent to
    # the shard(s) whose partial achieves the combined extreme (ties: all —
    # composing with the per-shard kernel routing (w*m == partial) this
    # reproduces the reference's every-tying-edge semantics,
    # operator.cuh:62-77, across edge shards). The combined value is used
    # on EVERY shard (replicated downstream), so each shard's cotangent is
    # only its own contribution — accumulate with a psum before routing
    # (the same reason psum's own transpose is a psum).
    x, y = res
    return (jnp.where(x == y, jax.lax.psum(g, axis), 0.0),)


_pextreme.defvjp(_pextreme_fwd, _pextreme_bwd)


def _combine(x, axis, kind="sum"):
    """Combine per-edge-shard partial aggregates across the edge axis."""
    if axis is None:
        return x
    if kind == "sum":
        return jax.lax.psum(x, axis)
    if kind == "max":
        return _pextreme(x, axis, False)
    if kind == "min":
        return _pextreme(x, axis, True)
    raise ValueError(kind)


def linear(p, x):
    return x @ p["w"] + p["b"]


def layer_norm(p, x, eps: float = 1e-5):
    """torch.nn.LayerNorm semantics (biased variance, eps inside sqrt)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _activation(name: Optional[str], x):
    if not name:
        return x
    return getattr(jax.nn, name)(x)


def layer_relation(params, cfg: ConvConfig, query=None, relation_input=None):
    """Per-layer relation features, (R, B, D) node(relation)-major.

    Three variants, mirroring layers.py:70-80:
      - dependent: project the (B, D) query -> (R, B, D)
      - default:   per-layer embedding (R, D) broadcast over batch
      - project_relations: 2-layer MLP on externally injected (B, R, D)
        relation representations (the relation-graph output).
    """
    if cfg.dependent:
        b = query.shape[0]
        rel = linear(params["relation_linear"], query)  # (B, R*D)
        rel = rel.reshape(b, cfg.num_relation, cfg.input_dim)
        return jnp.swapaxes(rel, 0, 1)  # (R, B, D)
    if cfg.project_relations:
        p = params["relation_projection"]
        h = jax.nn.relu(relation_input @ p["w1"] + p["b1"])
        rel = h @ p["w2"] + p["b2"]  # (B, R, D)
        return jnp.swapaxes(rel, 0, 1)  # (R, B, D)
    rel = params["relation"]  # (R, D)
    b = query.shape[0]
    return jnp.broadcast_to(rel[:, None, :], (rel.shape[0], b, rel.shape[1]))


def _pna_features(sum_, sq_sum, max_, min_, boundary, deg):
    """PNA 12*d feature layout ({mean,max,min,std} x {1, logdeg, 1/logdeg});
    the boundary folds in as one extra self-message (layers.py:208-226)."""
    mean = (sum_ + boundary) / deg
    sq_mean = (sq_sum + jnp.square(boundary)) / deg
    max_ = jnp.maximum(max_, boundary)
    min_ = jnp.minimum(min_, boundary)
    std = jnp.sqrt(jnp.clip(sq_mean - jnp.square(mean), min=EPS))
    features = jnp.stack([mean, max_, min_, std], axis=-1)  # (V,B,D,4)
    features = features.reshape(*features.shape[:-2], -1)  # (V,B,4D)
    scale = jnp.log(deg)
    scale = scale / jnp.mean(scale)
    scales = jnp.concatenate(
        [jnp.ones_like(scale), scale, 1.0 / jnp.clip(scale, min=1e-2)], axis=-1
    )  # (V,1,3)
    return (features[..., None] * scales[..., None, :]).reshape(
        *features.shape[:-1], -1
    )  # (V,B,12D); the update Linear then takes [input (d) || update (12d)] = 13d


def _rotate_sum_rspmm(cfg: ConvConfig, graph: Graph, relation, input,
                      use_plans: bool):
    """Fused RotatE × sum via ONE distmult rspmm at 2× feature width.

    Complex multiplication is bilinear in (relation, input), so the rotate
    message decomposes into four real elementwise products that a
    distmult-style sum rspmm computes directly:

      out_re = S(r_re, x_re) − S(r_im, x_im)
      out_im = S(r_im, x_re) + S(r_re, x_im),
      S(r, x)[v] = Σ_e w_e · r[type_e] ⊙ x[src_e]   (dst(e) = v)

    Stacking [x_re‖x_im‖x_re‖x_im] against [r_re‖r_im‖r_im‖r_re] yields all
    four in one kernel call — O(V·d) memory, full v1/v2 Pallas + custom-VJP
    coverage, unlike the reference which computes rotate only on the
    per-edge O(E·d) fallback (layers.py:91-94,135-154)."""
    d2 = input.shape[-1]
    assert d2 % 2 == 0, "rotate needs an even feature dim (complex pairs)"
    d = d2 // 2
    x_re, x_im = input[..., :d], input[..., d:]
    r_re, r_im = relation[..., :d], relation[..., d:]
    x4 = jnp.concatenate([x_re, x_im, x_re, x_im], axis=-1)  # (V, B, 2D)
    r4 = jnp.concatenate([r_re, r_im, r_im, r_re], axis=-1)  # (R, B, 2D)
    out4 = rspmm_from_graph(
        graph, r4, x4, sum="add", mul="mul", backend=cfg.rspmm_backend,
        use_plans=use_plans, precision=cfg.precision,
    )  # (V, B, 2D): [S(r_re,x_re) ‖ S(r_im,x_im) ‖ S(r_im,x_re) ‖ S(r_re,x_im)]
    out_re = out4[..., :d] - out4[..., d:2 * d]
    out_im = out4[..., 2 * d:3 * d] + out4[..., 3 * d:]
    return jnp.concatenate([out_re, out_im], axis=-1)


def _conv_rotate(params, cfg: ConvConfig, graph: Graph, input, boundary, relation):
    """RotatE message (complex rotation, layers.py:142-147) with per-edge
    materialization + XLA segment reductions, for the NON-decomposable
    aggregators max/pna (mirroring the reference per-edge fallback,
    layers.py:156-181). sum/mean take the fused ``_rotate_sum_rspmm`` path.
    CPU-oriented: no shipped config uses rotate+max/pna, and XLA scatter
    does not scale on the tunneled TPU (see CLAUDE.md)."""
    n_elem = graph.edge_index.shape[1] * int(input.shape[1]) * int(input.shape[2])
    if n_elem > 1 << 28:
        logger.warning(
            "rotate + %s uses the per-edge fallback: materializes %.2g "
            "message elements (O(E*B*D)); this path is CPU-oriented and "
            "will OOM / not complete at KG scale on TPU. Use sum/mean "
            "aggregation for the fused kernel path.",
            cfg.aggregate_func, float(n_elem),
        )
    src = graph.edge_index[1]
    x_e = jnp.take(input, src, axis=0)  # (E, B, D)
    r_e = jnp.take(relation, graph.edge_type, axis=0)
    d = x_e.shape[-1] // 2
    x_re, x_im = x_e[..., :d], x_e[..., d:]
    r_re, r_im = r_e[..., :d], r_e[..., d:]
    msg = jnp.concatenate(
        [x_re * r_re - x_im * r_im, x_re * r_im + x_im * r_re], axis=-1
    )
    dst = graph.edge_index[0]
    v = graph.num_nodes
    ax = cfg.edge_axis
    live = graph.edge_weight != 0.0

    def seg_sum(m):
        return _combine(
            jax.ops.segment_sum(m * graph.edge_weight[:, None, None], dst, num_segments=v), ax
        )

    def seg_ext(m, is_min):
        fill = jnp.inf if is_min else -jnp.inf
        m = jnp.where(live[:, None, None], m * graph.edge_weight[:, None, None], fill)
        op = jax.ops.segment_min if is_min else jax.ops.segment_max
        return _combine(op(m, dst, num_segments=v), ax, "min" if is_min else "max")

    if cfg.aggregate_func == "sum":
        update = seg_sum(msg) + boundary
    elif cfg.aggregate_func == "mean":
        deg = _combine(degree(graph, include_self_loop=False), ax)[:, None, None] + 1.0
        update = (seg_sum(msg) + boundary) / deg
    elif cfg.aggregate_func == "max":
        update = jnp.maximum(seg_ext(msg, is_min=False), boundary)
    elif cfg.aggregate_func == "pna":
        deg = _combine(degree(graph, include_self_loop=False), ax)[:, None, None] + 1.0
        update = _pna_features(
            seg_sum(msg), seg_sum(jnp.square(msg)),
            seg_ext(msg, is_min=False), seg_ext(msg, is_min=True),
            boundary, deg,
        )
    else:
        raise ValueError(f"unknown aggregate_func {cfg.aggregate_func!r}")
    output = linear(params["linear"], jnp.concatenate([input, update], axis=-1))
    if cfg.layer_norm:
        output = layer_norm(params["layer_norm"], output)
    return _activation(cfg.activation, output)


def conv_apply(
    params,
    cfg: ConvConfig,
    graph: Graph,
    input: jax.Array,  # (V, B, D) node states
    boundary: jax.Array,  # (V, B, D) layer-0 boundary condition
    query: jax.Array = None,  # (B, D) query embeddings (for `dependent`)
    relation_input: jax.Array = None,  # (B, R, D) injected relation reprs
) -> jax.Array:
    """One Bellman-Ford message-passing round. Returns (V, B, out_dim).

    Fused semantics per aggregate_func follow layers.py:193-231 exactly,
    including the boundary-condition folding and PNA's 13*d feature layout.
    """
    relation = layer_relation(params, cfg, query=query, relation_input=relation_input)
    mul = _MESSAGE2MUL.get(cfg.message_func)
    rotate = cfg.message_func == "rotate"
    if mul is None and not rotate:
        raise NotImplementedError(f"unknown message_func {cfg.message_func!r}")
    if rotate and cfg.aggregate_func not in ("sum", "mean"):
        # max/pna don't decompose under the complex product — per-edge
        # fallback (CPU-oriented; warns at scale), like the reference
        # (layers.py:91-94,135-181).
        return _conv_rotate(params, cfg, graph, input, boundary, relation)
    backend = cfg.rspmm_backend
    # replicated plan tables are inconsistent with shard-local edge arrays;
    # per-shard (stacked) plans are fine — the caller flags them
    use_plans = cfg.edge_axis is None or cfg.sharded_plans
    if cfg.compute_dtype:
        kdt = jnp.dtype(cfg.compute_dtype)
        input = input.astype(kdt)
        relation = relation.astype(kdt)

    def _sum_update():
        if rotate:
            return _rotate_sum_rspmm(cfg, graph, relation, input, use_plans)
        return rspmm_from_graph(
            graph, relation, input, sum="add", mul=mul, backend=backend,
            use_plans=use_plans, precision=cfg.precision,
        )

    ax = cfg.edge_axis
    if cfg.aggregate_func == "sum":
        update = _combine(_sum_update(), ax)
        update = update + boundary
    elif cfg.aggregate_func == "mean":
        deg = _combine(degree(graph, include_self_loop=False), ax)[:, None, None] + 1.0
        update = _combine(_sum_update(), ax)
        update = (update + boundary) / deg
    elif cfg.aggregate_func == "max":
        update = _combine(
            rspmm_from_graph(graph, relation, input, sum="max", mul=mul, backend=backend, use_plans=use_plans,
                            precision=cfg.precision),
            ax, "max",
        )
        update = jnp.maximum(update, boundary)
    elif cfg.aggregate_func == "pna":
        deg = _combine(degree(graph, include_self_loop=False), ax)[:, None, None] + 1.0
        sum_ = _combine(
            rspmm_from_graph(graph, relation, input, sum="add", mul=mul, backend=backend, use_plans=use_plans,
                            precision=cfg.precision), ax
        )
        sq_sum = _combine(
            rspmm_from_graph(
                graph, jnp.square(relation), jnp.square(input), sum="add", mul=mul,
                backend=backend, use_plans=use_plans, precision=cfg.precision,
            ), ax
        )
        max_ = _combine(
            rspmm_from_graph(graph, relation, input, sum="max", mul=mul, backend=backend, use_plans=use_plans,
                            precision=cfg.precision),
            ax, "max",
        )
        min_ = _combine(
            rspmm_from_graph(graph, relation, input, sum="min", mul=mul, backend=backend, use_plans=use_plans,
                            precision=cfg.precision),
            ax, "min",
        )
        update = _pna_features(sum_, sq_sum, max_, min_, boundary, deg)
    else:
        raise ValueError(f"unknown aggregate_func {cfg.aggregate_func!r}")

    output = linear(params["linear"], jnp.concatenate([input, update], axis=-1))
    if cfg.layer_norm:
        output = layer_norm(params["layer_norm"], output)
    return _activation(cfg.activation, output)
