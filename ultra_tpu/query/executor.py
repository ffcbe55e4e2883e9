"""UltraQuery execution on TPU: fixed-length, slot-synchronous program
interpreter.

The reference executor (ultraquery.py:85-136) runs a host-side ``while`` loop
over data-dependent instruction pointers — the single most XLA-hostile
construct in the codebase. Here programs are already padded to a fixed
length, and execution is **slot-synchronous**: slot i of every query executes
at step i (cheap fuzzy-set ops are masked vector ops; the expensive GNN
projection is wrapped in ``lax.cond`` so it only runs on slots where at least
one query projects). Per-sample op order is preserved, so results are
identical to the reference's deferred-batching scheduler; only the grouping
of projections into GNN calls differs.

Training-time traversal dropout (ultraquery.py:34-83) is factored out to the
host: the symbolic stack machine is exactly boolean, independent of neural
outputs, so ``simulate_symbolic`` (numpy) precomputes per-slot dropped-edge
weights and rebuilt relation graphs (ultraquery.py:199-203); the device
executor takes an optional per-slot list of graphs with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ultra_tpu import tasks
from ultra_tpu.graph import Graph, make_graph
from ultra_tpu.models.nbfnet import UltraConfig, query_nbfnet_apply, rel_nbfnet_apply
from ultra_tpu.query import ops

STACK_SIZE = 2  # ultraquery.py:24


@struct.dataclass
class QueryConfig:
    logic: str = "product"  # godel | product | lukasiewicz
    threshold: float = 0.0  # multi-source propagation fix (ultraquery.py:266-270)
    dropout_ratio: float = 0.25
    more_dropout: float = 0.0
    stack_size: int = STACK_SIZE


def conjunction(logic: str, x, y):
    if logic == "godel":
        return jnp.minimum(x, y)
    if logic == "product":
        return x * y
    if logic == "lukasiewicz":
        return jnp.clip(x + y - 1, min=0)
    raise ValueError(f"unknown fuzzy logic {logic!r}")


def disjunction(logic: str, x, y):
    if logic == "godel":
        return jnp.maximum(x, y)
    if logic == "product":
        return x + y - x * y
    if logic == "lukasiewicz":
        return jnp.clip(x + y, max=1)
    raise ValueError(f"unknown fuzzy logic {logic!r}")


def negation(x):
    return 1.0 - x


# ---------------------------------------------------------------------------
# masked batched stack (device): jnp port of query_utils.py:198-235
# ---------------------------------------------------------------------------


def stack_push(stack, sp, mask, value):
    """stack (B, S, V), sp (B,), mask (B,), value (B, V)."""
    b = stack.shape[0]
    idx = jnp.clip(sp, 0, stack.shape[1] - 1)
    new = stack.at[jnp.arange(b), idx].set(
        jnp.where(mask[:, None], value, stack[jnp.arange(b), idx])
    )
    return new, jnp.where(mask, sp + 1, sp)


def stack_pop(stack, sp, mask):
    b = stack.shape[0]
    idx = jnp.clip(sp - 1, 0, stack.shape[1] - 1)
    value = stack[jnp.arange(b), idx]
    return value, jnp.where(mask, sp - 1, sp)


# ---------------------------------------------------------------------------
# relation projection (ultraquery.py:245-277)
# ---------------------------------------------------------------------------


def relation_projection(params, ultra_cfg: UltraConfig, qcfg: QueryConfig, graph: Graph, h_prob, r_index,
                        rel_reprs_all=None):
    """One hop: (B, V) fuzzy set + (B,) relations -> (B, V) fuzzy set.

    ``rel_reprs_all`` ((R, R, D), eval-time): precomputed relation-graph
    outputs per query relation — skips the relation GNN per projection.
    """
    b = r_index.shape[0]
    if rel_reprs_all is not None:
        rel_reprs = jnp.take(rel_reprs_all, r_index, axis=0)  # (B, R, D)
    else:
        rel_reprs = rel_nbfnet_apply(
            params["relation_model"], ultra_cfg.relation_model, graph.relation_graph, r_index
        )  # (B, R, D)
    query = rel_reprs[jnp.arange(b), r_index]  # (B, D)

    if qcfg.threshold > 0.0:
        h_prob = jnp.where(h_prob > qcfg.threshold, h_prob, 0.0)
    # node-major boundary: (V, B, D) = h_prob^T outer query
    node_features = h_prob.T[:, :, None] * query[None, :, :]
    output = query_nbfnet_apply(
        params["entity_model"], ultra_cfg.entity_model, graph, node_features, rel_reprs, query
    )  # (B, V)
    return jax.nn.sigmoid(output)


# ---------------------------------------------------------------------------
# device executor
# ---------------------------------------------------------------------------


def execute(
    params,
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    graphs: Union[Graph, Sequence[Graph]],
    kind: jax.Array,  # (B, L) int8 (ops.decompose)
    operand: jax.Array,  # (B, L) int32
    rel_reprs_all=None,  # (R, R, D) eval-time relation cache
):
    """Returns (B, V) logits over answer nodes (ultraquery.py:138-144).

    ``graphs``: a single Graph (eval) or one per slot (training-time
    traversal dropout edits both the edge weights and the relation graph).
    ``rel_reprs_all`` is only valid with a single shared graph (the
    relation graph changes per slot under traversal dropout).
    """
    if rel_reprs_all is not None:
        assert not isinstance(graphs, (list, tuple)), (
            "relation cache requires a single shared graph"
        )
    first = graphs[0] if isinstance(graphs, (list, tuple)) else graphs
    b = kind.shape[0]
    length = kind.shape[1]
    v = first.num_nodes

    stack = jnp.zeros((b, qcfg.stack_size, v), jnp.float32)
    sp = jnp.zeros((b,), jnp.int32)

    for i in range(length):
        graph = graphs[i] if isinstance(graphs, (list, tuple)) else graphs
        k = kind[:, i]
        arg = operand[:, i]

        is_operand = k == ops.K_OPERAND
        is_inter = k == ops.K_INTERSECTION
        is_union = k == ops.K_UNION
        is_neg = k == ops.K_NEGATION
        is_proj = k == ops.K_PROJECTION

        # operand: push one-hot (ultraquery.py:147-154)
        onehot = jax.nn.one_hot(jnp.clip(arg, 0, v - 1), v, dtype=jnp.float32)
        stack, sp = stack_push(stack, sp, is_operand, onehot)

        # binary ops (ultraquery.py:156-182)
        is_binary = is_inter | is_union
        y, sp = stack_pop(stack, sp, is_binary)
        x, sp = stack_pop(stack, sp, is_binary)
        z = jnp.where(
            is_inter[:, None],
            conjunction(qcfg.logic, x, y),
            disjunction(qcfg.logic, x, y),
        )
        stack, sp = stack_push(stack, sp, is_binary, z)

        # negation (ultraquery.py:184-194)
        xn, sp = stack_pop(stack, sp, is_neg)
        stack, sp = stack_push(stack, sp, is_neg, negation(xn))

        # projection — the expensive GNN hop; only runs when some query
        # projects at this slot (lax.cond on a traced predicate)
        h_prob, sp = stack_pop(stack, sp, is_proj)

        def do_projection(carry):
            stack, sp, h_prob = carry
            t_prob = relation_projection(
                params, ultra_cfg, qcfg, graph,
                jax.lax.stop_gradient(h_prob),  # detach (ultraquery.py:209)
                jnp.clip(arg, 0, graph.num_relations - 1),
                rel_reprs_all=rel_reprs_all,
            )
            stack, sp = stack_push(stack, sp, is_proj, t_prob)
            return stack, sp

        def skip(carry):
            stack, sp, h_prob = carry
            # undo the speculative pop for non-projecting samples handled by
            # the mask already; push nothing
            return stack, sp

        stack, sp = jax.lax.cond(
            jnp.any(is_proj), do_projection, skip, (stack, sp, h_prob)
        )

    t_prob, sp = stack_pop(stack, sp, jnp.ones((b,), bool))
    t_logit = jnp.log((t_prob + 1e-10) / (1 - t_prob + 1e-10))
    return t_logit


# ---------------------------------------------------------------------------
# round-grouped executor (eval): batch projections across program positions
# ---------------------------------------------------------------------------


# jit-cache control for the grouped executor: every distinct n_rounds is a
# separate compiled variant (15-25 min cold on the tunneled TPU for the
# training step). Standard BetaE query types have at most 3 chained
# projections, so buckets (1, 2, 3) never pad in practice; deeper/exotic
# programs round up to the next bucket (a pad round costs one full GNN call
# whose outputs are mask-discarded) instead of minting a new variant each.
ROUND_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16)


def bucket_rounds(n_rounds: int) -> int:
    """Smallest ROUND_BUCKETS entry >= n_rounds (n_rounds itself beyond)."""
    for b in ROUND_BUCKETS:
        if n_rounds <= b:
            return b
    return n_rounds


def pad_round_schedule(has_proj, arg_slot, n_rounds: int, round_graphs=None):
    """Pad a projection_schedule to its round bucket. Pad rounds have
    has_proj all-False (their GNN call runs but every query's pop/push is
    masked off — no numeric or gradient effect) and, for training, repeat
    the last round graph. Returns (has_proj, arg_slot, n_bucket,
    round_graphs_or_None)."""
    nb = bucket_rounds(n_rounds) if n_rounds else 0
    if nb == n_rounds:
        return has_proj, arg_slot, n_rounds, round_graphs
    b = has_proj.shape[0]
    pad = nb - n_rounds
    has_proj = np.concatenate([np.asarray(has_proj),
                               np.zeros((b, pad), bool)], axis=1)
    arg_slot = np.concatenate([np.asarray(arg_slot),
                               np.zeros((b, pad), np.int32)], axis=1)
    if round_graphs is not None:
        round_graphs = list(round_graphs) + [round_graphs[-1]] * pad
    return has_proj, arg_slot, nb, round_graphs


def projection_schedule(kind: np.ndarray):
    """Host-side schedule for :func:`execute_grouped`.

    The slot-synchronous :func:`execute` pays one GNN call per program slot
    where *any* query projects — on a mixed 14-type batch that is ~L-1
    calls. The reference's deferred scheduler (ultraquery.py:109-133) runs
    every query's machine until it blocks on a projection and batches all
    pending projections into one call, so the call count is
    max_b(#projections in query b) — 3 on any BetaE mix. This schedule
    reproduces that grouping for a fixed-shape executor:

    ``round_of[b, i]`` = number of projection slots strictly before slot i
    in query b. Cheap slots with ``round_of == r`` sit between projections
    r-1 and r and run in round r's cheap pass; the projection slot with
    ``round_of == r`` *is* round r's projection (all queries' round-r
    projections batch into one GNN call).

    Returns (round_of (B, L) int32, has_proj (B, R) bool,
    r_arg (B, R) int32, n_rounds).
    """
    kindn = np.asarray(kind)
    is_proj = kindn == ops.K_PROJECTION
    round_of = (np.cumsum(is_proj, axis=1) - is_proj).astype(np.int32)
    n_rounds = int(is_proj.sum(axis=1).max()) if kindn.size else 0
    b = kindn.shape[0]
    has_proj = np.zeros((b, n_rounds), bool)
    arg_slot = np.zeros((b, n_rounds), np.int64)
    rows, slots = np.nonzero(is_proj)
    has_proj[rows, round_of[rows, slots]] = True
    arg_slot[rows, round_of[rows, slots]] = slots
    return round_of, has_proj, arg_slot.astype(np.int32), n_rounds


def execute_grouped(
    params,
    ultra_cfg: UltraConfig,
    qcfg: QueryConfig,
    graphs: Union[Graph, Sequence[Graph]],
    kind: jax.Array,     # (B, L) int8
    operand: jax.Array,  # (B, L) int32
    round_of: jax.Array,  # (B, L) int32 (projection_schedule)
    has_proj: jax.Array,  # (B, R) bool
    arg_slot: jax.Array,  # (B, R) int32 — slot of round-r projection
    n_rounds: int,
    rel_reprs_all=None,
):
    """(B, V) logits like :func:`execute`, with projections grouped into
    ``n_rounds`` batched GNN calls.

    ``graphs``: a single shared Graph (eval) or one per ROUND (training —
    simulate_symbolic_grouped's per-round traversal-dropout masks; the
    reference applies dropout once per apply_projection round for the
    whole batch, ultraquery.py:196-203, so per-round graphs are its exact
    granularity). ``rel_reprs_all`` requires the single shared graph."""
    if rel_reprs_all is not None:
        assert not isinstance(graphs, (list, tuple)), (
            "relation cache requires a single shared graph"
        )
    first = graphs[0] if isinstance(graphs, (list, tuple)) else graphs
    b, length = kind.shape
    v = first.num_nodes

    stack = jnp.zeros((b, qcfg.stack_size, v), jnp.float32)
    sp = jnp.zeros((b,), jnp.int32)

    for r in range(n_rounds + 1):
        for i in range(length):
            gate = round_of[:, i] == r
            k = kind[:, i]
            arg = operand[:, i]

            is_operand = gate & (k == ops.K_OPERAND)
            is_inter = gate & (k == ops.K_INTERSECTION)
            is_union = gate & (k == ops.K_UNION)
            is_neg = gate & (k == ops.K_NEGATION)

            onehot = jax.nn.one_hot(jnp.clip(arg, 0, v - 1), v, dtype=jnp.float32)
            stack, sp = stack_push(stack, sp, is_operand, onehot)

            is_binary = is_inter | is_union
            y, sp = stack_pop(stack, sp, is_binary)
            x, sp = stack_pop(stack, sp, is_binary)
            z = jnp.where(
                is_inter[:, None],
                conjunction(qcfg.logic, x, y),
                disjunction(qcfg.logic, x, y),
            )
            stack, sp = stack_push(stack, sp, is_binary, z)

            xn, sp = stack_pop(stack, sp, is_neg)
            stack, sp = stack_push(stack, sp, is_neg, negation(xn))

        if r < n_rounds:
            graph = graphs[r] if isinstance(graphs, (list, tuple)) else graphs
            proj = has_proj[:, r]
            r_index = operand[jnp.arange(b), arg_slot[:, r]]
            h_prob, sp = stack_pop(stack, sp, proj)
            t_prob = relation_projection(
                params, ultra_cfg, qcfg, graph,
                jax.lax.stop_gradient(h_prob),
                jnp.clip(r_index, 0, graph.num_relations - 1),
                rel_reprs_all=rel_reprs_all,
            )
            stack, sp = stack_push(stack, sp, proj, t_prob)

    t_prob, sp = stack_pop(stack, sp, jnp.ones((b,), bool))
    return jnp.log((t_prob + 1e-10) / (1 - t_prob + 1e-10))


# ---------------------------------------------------------------------------
# host-side symbolic machine + traversal dropout (training data pipeline)
# ---------------------------------------------------------------------------


def symbolic_traversal_host(h_sets, r_index, edge_index, edge_type, live):
    """Boolean traversal: t in out[b] iff an edge (h -> t) of type r_index[b]
    with h in h_sets[b] survives (ultraquery.py:281-298). numpy."""
    b, v = h_sets.shape
    out = np.zeros_like(h_sets)
    for i in range(b):
        mask = live & (edge_type == r_index[i]) & h_sets[i, edge_index[0]]
        out[i, edge_index[1][mask]] = True
    return out


def traversal_dropout_host(
    h_sets, r_index, edge_index, edge_type, live, num_relations,
    rng, dropout_ratio, more_dropout=0.0, inverse_rel_plus_one=False,
    matchers=None, degrees=None,
):
    """Edge ids to drop for this projection round (ultraquery.py:34-83).

    ``matchers``/``degrees``: optional round-independent precomputations
    (see DropoutPlanner) — dropout always starts from the original graph
    (live == all ones in that caller), so the match tables and degree
    counts never change between rounds.
    """
    sample, h_index = np.nonzero(h_sets)
    r = np.asarray(r_index)[sample]

    if matchers is None:
        matcher_d = tasks.EdgeMatcher(
            np.stack([edge_index[0], edge_type]).astype(np.int64)
        )
        matcher_i = tasks.EdgeMatcher(
            np.stack([edge_type, edge_index[1]]).astype(np.int64)
        )
    else:
        matcher_d, matcher_i = matchers
    direct_ids, _ = matcher_d.query(np.stack([h_index, r]))
    if inverse_rel_plus_one:
        inv_r = r ^ 1
    else:
        half = num_relations // 2
        inv_r = np.where(r >= half, r - half, r + half)
    inverse_ids, _ = matcher_i.query(np.stack([inv_r, h_index]))

    ids = np.concatenate([direct_ids, inverse_ids])
    ids = ids[live[ids]]

    # never drop edges whose endpoints have degree <= 1 (ultraquery.py:56-62)
    if degrees is None:
        deg_h = np.bincount(
            edge_index[0], weights=live.astype(np.int64), minlength=h_sets.shape[1]
        )
        deg_t = np.bincount(
            edge_index[1], weights=live.astype(np.int64), minlength=h_sets.shape[1]
        )
    else:
        deg_h, deg_t = degrees
    must_keep = (deg_h[edge_index[0, ids]] <= 1) | (deg_t[edge_index[1, ids]] <= 1)
    ids = ids[~must_keep]
    ids = ids[rng.random(len(ids)) <= dropout_ratio]

    if more_dropout > 0.0:
        more = np.nonzero(rng.random(edge_index.shape[1]) <= more_dropout)[0]
        keep = (deg_h[edge_index[0, more]] <= 1) | (deg_t[edge_index[1, more]] <= 1)
        more = more[~keep]
        ids = np.unique(np.concatenate([ids, more]))
    return ids


class DropoutPlanner:
    """Round-independent precomputation for training-time traversal dropout.

    The per-projection host pipeline (dropout match -> relation-graph rebuild
    -> Pallas re-plan) costs ~0.7 s/round on FB15k-237-sized graphs when done
    from scratch (CLAUDE.md perf notes). Everything in it except the random
    draw is a pure function of the *base* graph, because dropout is applied
    per round from the original edge set (ultraquery.py:196-203):

    - the direct/inverse EdgeMatchers and endpoint degrees used by
      traversal_dropout_host (two O(E log E) sorts per call otherwise);
    - a tasks.RelGraphMasker turning each round's dropped-edge set into a
      weight mask over the **base** relation graph in O(|dropped|) — valid
      because dropout only removes KG edges, so the rebuilt relation graph is
      always a sub-edge-set of the base one, and weight 0 == absent for every
      kernel (graph.py). The base relation graph's Pallas plan and jit trace
      are then shared by all slots and all rounds.

    ``rel_edge_index/rel_edge_type`` must be the exact arrays the attached
    base relation graph was built from (same order); if omitted they are
    recomputed with tasks.build_relation_graph_arrays (deterministic).
    """

    def __init__(self, graph_host: dict, rel_edge_index=None, rel_edge_type=None):
        ei = np.asarray(graph_host["edge_index"])
        et = np.asarray(graph_host["edge_type"])
        v = graph_host["num_nodes"]
        self.matchers = (
            tasks.EdgeMatcher(np.stack([ei[0], et]).astype(np.int64)),
            tasks.EdgeMatcher(np.stack([et, ei[1]]).astype(np.int64)),
        )
        self.degrees = (
            np.bincount(ei[0], minlength=v),
            np.bincount(ei[1], minlength=v),
        )
        self.masker = tasks.RelGraphMasker(
            ei, et, v, graph_host["num_relations"], rel_edge_index, rel_edge_type
        )


class SymbolicPlan:
    """Per-slot dropped-edge weights + rebuilt relation graphs for a batch.

    ``slot_rel_graphs`` entries are either full Graphs (slow rebuild path) or
    1-D weight arrays over the base relation graph's edges (DropoutPlanner
    fast path)."""

    def __init__(self, slot_weights: List[np.ndarray], slot_rel_graphs: List):
        self.slot_weights = slot_weights
        self.slot_rel_graphs = slot_rel_graphs


def simulate_symbolic(
    kind: np.ndarray,
    operand: np.ndarray,
    graph_host: dict,
    qcfg: QueryConfig,
    rng: np.random.Generator,
    rel_pad_to: Optional[int] = None,
    training: bool = True,
    rel_plan_template: Optional[dict] = None,  # {rb, chunk, pad_chunks_to}
    planner: Optional[DropoutPlanner] = None,
):
    """Run the boolean stack machine slot-synchronously on the host, applying
    traversal dropout before each projection slot (training). Returns per-slot
    (edge_weight (E_pad,), rel_graph Graph) aligned with executor slots.

    graph_host: dict with edge_index (2,E live), edge_type, num_nodes,
    num_relations, e_pad, inverse_rel_plus_one.

    ``planner``: DropoutPlanner fast path — slot rel entries become weight
    arrays over the base relation graph instead of rebuilt Graphs
    (graphs_for_slots handles both), skipping the per-round relation-graph
    join and Pallas re-plan entirely.
    """
    edge_index = np.asarray(graph_host["edge_index"])
    edge_type = np.asarray(graph_host["edge_type"])
    v = graph_host["num_nodes"]
    num_rel = graph_host["num_relations"]
    e_pad = graph_host["e_pad"]
    e = edge_index.shape[1]

    b, length = kind.shape
    stack = np.zeros((b, qcfg.stack_size, v), dtype=bool)
    sp = np.zeros(b, dtype=np.int64)

    def push(mask, val):
        nonlocal stack, sp
        stack[mask, sp[mask]] = val[mask]
        sp[mask] += 1

    def pop(mask):
        nonlocal sp
        sp[mask] -= 1
        return stack[np.arange(b), np.clip(sp, 0, qcfg.stack_size - 1)]

    slot_weights, slot_rel_graphs = [], []
    for i in range(length):
        k, arg = kind[:, i], operand[:, i]
        is_operand = k == ops.K_OPERAND
        is_inter = k == ops.K_INTERSECTION
        is_union = k == ops.K_UNION
        is_neg = k == ops.K_NEGATION
        is_proj = k == ops.K_PROJECTION

        if is_operand.any():
            onehot = np.zeros((b, v), dtype=bool)
            onehot[np.arange(b), np.clip(arg, 0, v - 1)] = True
            push(is_operand, onehot)
        binary = is_inter | is_union
        if binary.any():
            y = pop(binary)
            x = pop(binary)
            z = np.where(is_inter[:, None], x & y, x | y)
            push(binary, z)
        if is_neg.any():
            x = pop(is_neg)
            push(is_neg, ~x)

        if is_proj.any():
            h_sets = pop(is_proj).copy()
            h_sets[~is_proj] = False
            # dropout is applied per projection round from the ORIGINAL
            # graph (apply_projection receives the unmodified graph each
            # round, ultraquery.py:196-203) — not cumulatively
            live = np.ones(e, dtype=bool)
            drop = np.zeros(0, dtype=np.int64)
            if training and qcfg.dropout_ratio > 0:
                drop = traversal_dropout_host(
                    h_sets[is_proj], arg[is_proj], edge_index, edge_type, live,
                    num_rel, rng, qcfg.dropout_ratio, qcfg.more_dropout,
                    graph_host.get("inverse_rel_plus_one", False),
                    matchers=planner.matchers if planner else None,
                    degrees=planner.degrees if planner else None,
                )
                live[drop] = False
            t_sets = symbolic_traversal_host(h_sets, arg, edge_index, edge_type, live)
            push(is_proj, t_sets)

            w = np.zeros(e_pad, dtype=np.float32)
            w[:e][live] = 1.0
            if planner is not None:
                slot_weights.append(w)
                slot_rel_graphs.append(planner.masker.edge_weights(drop))
                continue
            rel_ei, rel_et = tasks.build_relation_graph_arrays(
                edge_index, edge_type, v, num_rel, live=live
            )
            rel_graph = make_graph(
                rel_ei, rel_et, num_nodes=num_rel, num_relations=4, pad_to=rel_pad_to
            )
            if rel_plan_template is not None:
                from ultra_tpu.ops.rspmm_pallas import attach_plans

                e_rel = rel_ei.shape[1]
                pad = rel_graph.num_edges_padded - e_rel
                rel_graph = attach_plans(
                    rel_graph,
                    rb=rel_plan_template["rb"],
                    chunk=rel_plan_template["chunk"],
                    pad_chunks_to=rel_plan_template.get("pad_chunks_to"),
                    host_edges=(
                        np.pad(rel_ei, ((0, 0), (0, pad))),
                        np.pad(rel_et, (0, pad)),
                        np.pad(np.ones(e_rel, np.float32), (0, pad)),
                    ),
                )
            slot_weights.append(w)
            slot_rel_graphs.append(rel_graph)
        else:
            slot_weights.append(None)
            slot_rel_graphs.append(None)

    return SymbolicPlan(slot_weights, slot_rel_graphs)


def simulate_symbolic_grouped(
    kind: np.ndarray,
    operand: np.ndarray,
    round_of: np.ndarray,   # projection_schedule outputs
    has_proj: np.ndarray,
    arg_slot: np.ndarray,
    n_rounds: int,
    graph_host: dict,
    qcfg: QueryConfig,
    rng: np.random.Generator,
    planner: DropoutPlanner,
) -> SymbolicPlan:
    """Round-grouped twin of :func:`simulate_symbolic`: ONE traversal-dropout
    mask per projection round (the union of all round-r projecting queries'
    symbolic states) — exactly the reference's granularity, where
    apply_projection drops edges once per round for the whole batch
    (ultraquery.py:196-203). Returns a SymbolicPlan with one entry per
    ROUND (length n_rounds), for execute_grouped's per-round graphs.
    Requires the DropoutPlanner fast path."""
    edge_index = np.asarray(graph_host["edge_index"])
    edge_type = np.asarray(graph_host["edge_type"])
    v = graph_host["num_nodes"]
    num_rel = graph_host["num_relations"]
    e_pad = graph_host["e_pad"]
    e = edge_index.shape[1]

    b, length = kind.shape
    stack = np.zeros((b, qcfg.stack_size, v), dtype=bool)
    sp = np.zeros(b, dtype=np.int64)

    def push(mask, val):
        nonlocal stack, sp
        stack[mask, sp[mask]] = val[mask]
        sp[mask] += 1

    def pop(mask):
        nonlocal sp
        sp[mask] -= 1
        return stack[np.arange(b), np.clip(sp, 0, qcfg.stack_size - 1)]

    round_weights, round_rel = [], []
    for r in range(n_rounds + 1):
        for i in range(length):
            gate = round_of[:, i] == r
            k, arg = kind[:, i], operand[:, i]
            is_operand = gate & (k == ops.K_OPERAND)
            is_inter = gate & (k == ops.K_INTERSECTION)
            is_union = gate & (k == ops.K_UNION)
            is_neg = gate & (k == ops.K_NEGATION)
            if is_operand.any():
                onehot = np.zeros((b, v), dtype=bool)
                onehot[np.arange(b), np.clip(arg, 0, v - 1)] = True
                push(is_operand, onehot)
            binary = is_inter | is_union
            if binary.any():
                y = pop(binary)
                x = pop(binary)
                push(binary, np.where(is_inter[:, None], x & y, x | y))
            if is_neg.any():
                push(is_neg, ~pop(is_neg))

        if r < n_rounds:
            proj = has_proj[:, r]
            r_index = operand[np.arange(b), arg_slot[:, r]]
            h_sets = pop(proj).copy()
            h_sets[~proj] = False
            live = np.ones(e, dtype=bool)
            drop = np.zeros(0, dtype=np.int64)
            if qcfg.dropout_ratio > 0:
                drop = traversal_dropout_host(
                    h_sets[proj], r_index[proj], edge_index, edge_type, live,
                    num_rel, rng, qcfg.dropout_ratio, qcfg.more_dropout,
                    graph_host.get("inverse_rel_plus_one", False),
                    matchers=planner.matchers, degrees=planner.degrees,
                )
                live[drop] = False
            t_sets = symbolic_traversal_host(
                h_sets, r_index, edge_index, edge_type, live
            )
            push(proj, t_sets)
            w = np.zeros(e_pad, dtype=np.float32)
            w[:e][live] = 1.0
            round_weights.append(w)
            round_rel.append(planner.masker.edge_weights(drop))

    return SymbolicPlan(round_weights, round_rel)


def graphs_for_slots(base_graph: Graph, plan: SymbolicPlan) -> List[Graph]:
    """Materialize the per-slot Graph list for execute().

    Rel entries that are 1-D weight arrays (DropoutPlanner fast path) mask
    the base relation graph in place — its padded shape, Pallas plan, and
    jit trace stay shared across slots."""
    out = []
    for w, rg in zip(plan.slot_weights, plan.slot_rel_graphs):
        if w is None:
            out.append(base_graph)
            continue
        if isinstance(rg, np.ndarray):
            base_rel = base_graph.relation_graph
            pad = base_rel.num_edges_padded - len(rg)
            rg = base_rel.replace(
                edge_weight=jnp.asarray(np.pad(rg, (0, pad)))
            )
        out.append(
            base_graph.replace(edge_weight=jnp.asarray(w), relation_graph=rg)
        )
    return out
