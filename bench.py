"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: rspmm edges/sec/chip on an FB15k-237-shaped synthetic graph
(V=14541, 544K edges incl. inverses, 237 direct relations, batch 8 x dim 64
— the reference's transductive eval configuration, batch_size 8 per
config/transductive/inference.yaml), using the v2 (gather+fold) Pallas
kernel dispatched through the production rspmm_pallas_sum path.

Graph realism: real KGs have zipf relation histograms + entity-category
schema locality (FB15k-237's top relation covers ~4% of triples; people
link to films, not to enzymes). The headline graph uses
random_kg_triples(rel_dist="zipf", categories=30); a uniform-relation graph
(the worst case for the v2 planner's type clustering) is also measured and
reported in the JSON as `uniform_edges_per_sec`.

vs_baseline: ratio against an A100 estimate of the reference CUDA kernel.
The reference publishes no edges/s numbers (SURVEY.md §6); rspmm.cu is
memory-bound reading one 2KB input row + one 2KB relation row per edge
(~2.2GB/call at B*D=512); at 1555 GB/s HBM and ~70% efficiency that is
~1.0 ms -> ~2.5e8 edges/s. We report vs the 1.6e8 RTX-3090 estimate
(the reference's own published-numbers hardware).

Timing notes: on the tunneled TPU, block_until_ready is unreliable and
every dispatch pays ~25-40ms — so N iterations are chained inside one jit
(data-dependent fori_loop) and the N=1 run is subtracted (slope timing).
Configs are interleaved round-robin over ROUNDS rounds in one process and
the per-config median is reported, which cancels the up-to-45% session
drift (CLAUDE.md). Diagnostics go to stderr; stdout carries exactly one
JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

RTX3090_RSPMM_EDGES_PER_SEC = 1.6e8  # reference benchmark hardware estimate
A100_RSPMM_EDGES_PER_SEC = 3.3e8  # scale-up diagnostic estimate

# FB15k-237 shape: 14,541 entities; 272,115 train triples -> 544,230 edges
# with inverses; 237 direct relations (474 with inverses).
V, E_DIRECT, R_DIRECT = 14541, 272115, 237
B, D = 8, 64
ITERS = 16
ROUNDS = 3
# pinned plan config (VERDICT r1 #5): v1 rb=384/chunk=128, v2 chunk=1024 —
# the on-chip sweep winners; attach_plans defaults match.
V1_RB, V1_CHUNK, V2_CHUNK = 384, 128, 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chain(step, n):
    return jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: step(c), x))


def slope_ms(f1, fn, x0, n):
    """ms per step: ((time at n iters) - (time at 1 iter)) / (n - 1)."""
    t0 = time.perf_counter()
    float(jnp.sum(f1(x0)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(fn(x0)))
    tn = time.perf_counter() - t0
    return max(tn - t1, 1e-9) / (n - 1) * 1e3


def build(kind):
    from ultra_tpu.data.synthetic import random_kg_triples, with_inverses
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm_pallas import attach_plans

    kw = dict(rel_dist="zipf", categories=30) if kind == "realistic" else {}
    trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0, **kw)
    ei, et = with_inverses(trip, R_DIRECT)
    e_live = ei.shape[1]
    e_pad = pad_bucket(e_live, 8192)
    pad = e_pad - e_live
    host = (
        np.concatenate([ei, np.zeros((2, pad), np.int64)], axis=1),
        np.concatenate([et, np.zeros(pad, np.int64)]),
        np.concatenate([np.ones(e_live, np.float32), np.zeros(pad, np.float32)]),
    )
    graph = make_graph(ei, et, num_nodes=V, num_relations=2 * R_DIRECT, pad_to=e_pad)
    t0 = time.perf_counter()
    # w3/v2rg are DEAD on this Mosaic backend — their >8-row same-shape
    # gathers hit "Not implemented: Multiple source vregs along gather
    # dimension" (f32) / "Gather indices and result have different
    # bitwidths" (bf16) in the chip compiler (scripts/aot_compile_probe.py,
    # ROOFLINE.md round-3 probes). BENCH_TRY_W3=1 re-includes them so a
    # future backend upgrade is one env var away from re-measurement.
    try_dead = os.environ.get("BENCH_TRY_W3", "0") == "1"
    if try_dead:
        os.environ["ULTRA_V2_RELGATHER"] = "1"
    # uniform graphs attach the sum-only plan layout (sort_slots=True):
    # that is what every shipped sum/mean config gets via prepare_graph,
    # and it unlocks the planner's table-width auto-escalation (the global
    # 480-row table loses 15% — output/r4/uniform_tw3.log). realistic keeps
    # sort_slots=False because its v2 plan also serves the v2max timing.
    graph = attach_plans(
        graph, rb=V1_RB, chunk=V1_CHUNK, v2_chunk=V2_CHUNK, host_edges=host,
        w3=try_dead and os.environ.get("ULTRA_W3", "1") != "0",
        v2_sort_slots=(kind == "uniform"),
    )
    if try_dead:  # scope to this attach: the e2e rel-graph attach must not
        os.environ.pop("ULTRA_V2_RELGATHER", None)  # inherit a dead kernel
    p1, p2 = graph.plans.dst, graph.plans.v2
    stats = {
        "edges": e_live,
        "v1_rb": V1_RB, "v1_chunk": V1_CHUNK, "v1_chunks": p1.num_chunks,
        "v1_pad_waste": round(p1.num_chunks * V1_CHUNK / e_live, 3),
        "v2_chunk": V2_CHUNK, "v2_e_pad": p2.e_pad,
        "v2_pad_waste": round(p2.e_pad / e_live, 3),
        "v2_table_width": p2.tw, "v2_table_groups": p2.n_groups,
        "v2_sorted_slots": p2.sorted_slots,
        "plan_build_s": round(time.perf_counter() - t0, 1),
    }
    if graph.plans.w3 is not None:
        from ultra_tpu.ops.rspmm_pallas_w3 import plan_stats

        stats["w3"] = plan_stats(graph.plans.w3, e_live)
    log(f"[{kind}] graph: V={V} E={e_live} R={2*R_DIRECT} feat={B}x{D} | {stats}")
    return graph, stats


def attach_fb_relgraph(graph, ei, et):
    """Attach the relation graph (with its own Pallas plans) to an
    FB-shaped graph — the shared rig of bench's e2e diagnostics and the
    serving/CLQA experiment scripts (exp_serve_http, exp_clqa_eval_budget),
    so the measured configuration cannot silently diverge between them."""
    from ultra_tpu import tasks
    from ultra_tpu.graph import make_graph, pad_bucket
    from ultra_tpu.ops.rspmm_pallas import attach_plans

    rel_ei, rel_et = tasks.build_relation_graph_arrays(ei, et, V, 2 * R_DIRECT)
    rel_e_pad = pad_bucket(rel_ei.shape[1], 1024)
    rel_graph = make_graph(
        rel_ei, rel_et, num_nodes=2 * R_DIRECT, num_relations=4,
        pad_to=rel_e_pad,
    )
    rel_graph = attach_plans(
        rel_graph, rb=128, chunk=128,
        host_edges=(
            np.pad(rel_ei, ((0, 0), (0, rel_e_pad - rel_ei.shape[1]))),
            np.pad(rel_et, (0, rel_e_pad - rel_et.shape[0])),
            np.pad(np.ones(rel_et.shape[0], np.float32),
                   (0, rel_e_pad - rel_et.shape[0])),
        ),
    )
    return graph.replace(relation_graph=rel_graph)


def _clqa_mixed_batch(rng, v, r, length=10):
    """One query per BetaE structure (14 total), padded postfix programs —
    the mixed-batch shape of scripts/exp_grouped_exec.py."""
    from ultra_tpu.query import ops

    e = lambda: int(rng.integers(0, v))  # noqa: E731
    rr = lambda: ops.PROJECTION | int(rng.integers(0, r))  # noqa: E731
    I2, U2, N = ops.INTERSECTION | 2, ops.UNION | 2, ops.NEGATION
    qs = [
        [e(), rr()],                                  # 1p
        [e(), rr(), rr()],                            # 2p
        [e(), rr(), rr(), rr()],                      # 3p
        [e(), rr(), e(), rr(), I2],                   # 2i
        [e(), rr(), e(), rr(), I2, e(), rr(), I2],    # 3i
        [e(), rr(), e(), rr(), I2, rr()],             # ip
        [e(), rr(), rr(), e(), rr(), I2],             # pi
        [e(), rr(), e(), rr(), N, I2],                # 2in
        [e(), rr(), e(), rr(), I2, e(), rr(), N, I2],  # 3in
        [e(), rr(), e(), rr(), N, I2, rr()],          # inp
        [e(), rr(), rr(), e(), rr(), N, I2],          # pin
        [e(), rr(), rr(), N, e(), rr(), I2],          # pni
        [e(), rr(), e(), rr(), U2],                   # 2u
        [e(), rr(), e(), rr(), U2, rr()],             # up
    ]
    qs = [np.asarray(q + [ops.STOP], np.int64) for q in qs]
    return ops.pad_queries(qs, length)


_PROBE = (
    "import os;"
    "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
    " '/root/.cache/jax-comp-cache');"
    "import jax, jax.numpy as jnp;"
    "print(jax.devices());"
    "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"
)


def init_backend_with_retry(attempts=None, backoffs=(30, 60), probe_timeout=None):
    """The TPU tunnel drops two ways: jax.devices() raising 'Unavailable'
    (BENCH_r02) or HANGING indefinitely (observed this session). An
    in-process retry cannot recover from the hang, so each attempt probes
    the backend in a SUBPROCESS under a hard timeout; only after a probe
    succeeds do we trust in-process init. Raises BackendUnavailable after
    the last attempt so main() emits structured-error JSON at rc=0."""
    import subprocess

    if attempts is None:
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    if probe_timeout is None:
        probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "240"))
    last = "unknown"
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if proc.returncode == 0:
                devs = jax.devices()  # safe now: the probe just succeeded
                log(f"devices: {devs}")
                return devs
            last = f"probe rc={proc.returncode}: {proc.stderr[-300:]}"
        except subprocess.TimeoutExpired:
            last = f"probe hung >{probe_timeout}s (tunnel down)"
        except Exception as exc:  # noqa: BLE001
            last = f"{type(exc).__name__}: {str(exc)[:300]}"
        log(f"backend probe attempt {i + 1}/{attempts} failed: {last}")
        if i + 1 < attempts:
            wait = backoffs[min(i, len(backoffs) - 1)]
            log(f"retrying in {wait}s ...")
            time.sleep(wait)
    raise BackendUnavailable(last)


class BackendUnavailable(RuntimeError):
    pass


def main():
    from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_sum

    init_backend_with_retry()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * R_DIRECT, B, D)).astype(np.float32))

    configs = {}  # name -> (graph, plans, edges)
    all_stats = {}
    for kind in ("realistic", "uniform"):
        graph, stats = build(kind)
        all_stats[kind] = stats
        if graph.plans.w3 is not None:  # ULTRA_W3=1: windowed-gather kernel
            configs[f"{kind}/w3"] = (
                graph, graph.plans.replace(v2rg=None, v2rgsrc=None),
                stats["edges"],
            )
        if graph.plans.v2rg is not None:  # ULTRA_V2_RELGATHER=1
            configs[f"{kind}/v2rg"] = (
                graph, graph.plans.replace(w3=None, w3src=None),
                stats["edges"],
            )
        configs[f"{kind}/v2"] = (
            graph,
            graph.plans.replace(w3=None, w3src=None, v2rg=None, v2rgsrc=None),
            stats["edges"],
        )
        configs[f"{kind}/v1"] = (
            graph,
            graph.plans.replace(v2=None, v2src=None, w3=None, w3src=None,
                                v2rg=None, v2rgsrc=None),
            stats["edges"],
        )

    chains = {}
    for name, (graph, plans, _) in configs.items():
        def step(x, g=graph, p=plans):
            out = rspmm_pallas_sum("mul", V, None, p, rel, x, g.edge_weight)
            return 0.999 * x + 0.001 * out

        chains[name] = (make_chain(step, 1), make_chain(step, ITERS))

    # the PNA-path max-aggregation primal (v2 hierarchical scan), timed in
    # the same process so the driver records it; slower by design than the
    # sum fwd, so it can never displace the headline
    from ultra_tpu.ops.rspmm_pallas import rspmm_pallas_minmax

    g_mm, p_mm, e_mm = configs["realistic/v2"]

    def step_mm(x):
        out = rspmm_pallas_minmax(
            p_mm, rel, x, g_mm.edge_weight, mul="mul", sum_op="max",
            num_nodes=V,
        )
        return 0.999 * x + 0.001 * jnp.where(jnp.isfinite(out), out, 0.0)

    configs["realistic/v2max"] = (g_mm, p_mm, e_mm)
    chains["realistic/v2max"] = (make_chain(step_mm, 1), make_chain(step_mm, ITERS))

    results = {name: [] for name in configs}
    broken = {}
    for name, (f1, fn) in list(chains.items()):  # compile warm-up pass
        try:
            float(jnp.sum(f1(x0))), float(jnp.sum(fn(x0)))
        except Exception as exc:  # noqa: BLE001 — drop the config, keep the bench
            log(f"{name}: compile/warmup FAILED {type(exc).__name__}: "
                f"{str(exc)[:300]}")
            broken[name] = f"{type(exc).__name__}"
            chains.pop(name)
    if not chains:
        raise RuntimeError(f"all bench configs failed: {broken}")
    for _ in range(ROUNDS):
        for name, (f1, fn) in chains.items():
            results[name].append(slope_ms(f1, fn, x0, ITERS))

    eps = {}
    for name in chains:
        rounds = results[name]
        med = sorted(rounds)[len(rounds) // 2]
        e_live = configs[name][2]
        eps[name] = e_live / (med / 1e3)
        log(f"{name}: rounds {['%.2f' % m for m in rounds]} median {med:.2f} ms "
            f"({eps[name]/1e6:.0f} M edges/s)")

    # headline = the FASTEST measured realistic config (all generations are
    # timed in the same interleaved process, so the comparison is fair)
    realistic = {n: v for n, v in eps.items() if n.startswith("realistic/")}
    headline_name = max(realistic or eps, key=(realistic or eps).get)
    headline = eps[headline_name]
    v1_eps = eps.get("realistic/v1")
    log(f"headline ({headline_name}): {headline/1e6:.1f} M edges/s | "
        f"vs RTX3090 est {headline/RTX3090_RSPMM_EDGES_PER_SEC:.2f}x | "
        f"vs A100 est {headline/A100_RSPMM_EDGES_PER_SEC:.2f}x"
        + (f" | speedup over v1 {headline/v1_eps:.2f}x" if v1_eps else ""))

    extra = {}
    # e2e diagnostic: full Ultra forward (12 GNN layers) with real weights
    try:
        from ultra_tpu.models.nbfnet import UltraConfig, ultra_score_all
        from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

        ckpt = "/root/reference/ckpts/ultra_3g.pth"
        if os.path.exists(ckpt):
            from ultra_tpu import tasks
            from ultra_tpu.data.synthetic import random_kg_triples, with_inverses

            # prune to v2-only plans: graph.plans may carry probe-gated
            # generations (w3/v2rg) that do not compile on this backend
            graph = configs["realistic/v2"][0]
            graph = graph.replace(plans=configs["realistic/v2"][1])
            trip = random_kg_triples(V, R_DIRECT, E_DIRECT, seed=0,
                                     rel_dist="zipf", categories=30)
            ei, et = with_inverses(trip, R_DIRECT)
            graph = attach_fb_relgraph(graph, ei, et)
            params = to_jax(convert_ultra_checkpoint(ckpt))
            cfg = UltraConfig()
            h = jnp.asarray(np.arange(B))
            rr = jnp.asarray(np.arange(B) % (2 * R_DIRECT))

            def fwd_step(x):
                out = ultra_score_all(params, cfg, graph, h, r_index=rr)
                return x + jnp.sum(out)[None] * 1e-6

            f1 = make_chain(fwd_step, 1)
            fn = make_chain(fwd_step, 4)
            float(jnp.sum(f1(jnp.zeros((1,)))))  # compile warm-up
            float(jnp.sum(fn(jnp.zeros((1,)))))
            fms = slope_ms(f1, fn, jnp.zeros((1,)), 4)
            log(f"ultra fwd (B=8, all-node scores, ultra_3g): {fms:.1f} ms")
            extra["ultra_fwd_ms"] = round(fms, 1)

            # fine-tune step diagnostic: value_and_grad + AdamW update
            # (bs 8, 32 strict negatives — config/transductive finetune
            # shape), chained through the TrainState carry so the slope
            # excludes dispatch
            # shared by the finetune + pretrain diagnostics below
            index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
            n_direct = ei.shape[1] // 2
            triples = np.stack(
                [ei[0, :n_direct], ei[1, :n_direct], et[:n_direct]], axis=1,
            )
            try:
                from ultra_tpu.train.loop import (
                    init_train_state, make_optimizer, make_train_step,
                )
                rng2 = np.random.default_rng(1)
                rows = triples[rng2.choice(n_direct, size=B, replace=False)]
                tb = tasks.negative_sampling(index, rows, num_negative=32,
                                             rng=rng2)
                tew = tasks.easy_edge_weights(index, tb,
                                              graph.num_edges_padded)
                tb, tew = jnp.asarray(tb), jnp.asarray(tew)
                opt_tx = make_optimizer()
                tstep = make_train_step(cfg, opt_tx, num_negative=32)
                state0 = init_train_state(params, opt_tx)

                def tchain(n):
                    return jax.jit(lambda st: jax.lax.fori_loop(
                        0, n,
                        lambda i, s: tstep(s, graph, tb, tew)[0], st,
                    ))

                t1c, tnc = tchain(1), tchain(4)

                def force(st):
                    return float(
                        jnp.sum(st.params["entity_model"]["mlp"][0]["w"])
                    )

                force(t1c(state0)); force(tnc(state0))  # compile warm-up
                t0 = time.perf_counter(); force(t1c(state0))
                ta = time.perf_counter(); force(tnc(state0))
                tb_end = time.perf_counter()
                tms = max((tb_end - ta) - (ta - t0), 1e-9) / 3 * 1e3
                log(f"finetune step (bs 8, 32 negs, chained): {tms:.0f} ms")
                extra["finetune_step_ms"] = round(tms, 1)
            except Exception as exc:  # noqa: BLE001
                log(f"train diagnostic skipped: {type(exc).__name__}: {exc}")

            # pretrain step diagnostic (round-5 headline training number):
            # bs 64 x 512 negs — the reference pretrain shape
            # (config/transductive/pretrain_3g.yaml:31-43) — with the
            # shipped winning config: grad_accum=8 micro-batches, remat
            # OFF (activations fit HBM at F=512; 1091 ms/step on the v5e,
            # evidence/r5/pretrain_width_r5b.log). Steps are ~1s, so
            # direct wall timing; skip with BENCH_SKIP_PRETRAIN=1.
            if os.environ.get("BENCH_SKIP_PRETRAIN", "0") != "1":
                try:
                    from ultra_tpu.train.loop import (
                        init_train_state, make_optimizer, make_train_step,
                    )

                    p_bs, p_neg, p_ga = 64, 512, 8
                    rng_p = np.random.default_rng(0)
                    rows_p = triples[
                        rng_p.choice(n_direct, size=p_bs, replace=False)
                    ]
                    pb = tasks.negative_sampling(
                        index, rows_p, num_negative=p_neg, rng=rng_p
                    )
                    pew = tasks.easy_edge_weights(
                        index, pb, graph.num_edges_padded
                    )
                    pb, pew = jnp.asarray(pb), jnp.asarray(pew)
                    opt_p = make_optimizer()
                    pstep = make_train_step(
                        cfg, opt_p, num_negative=p_neg, grad_accum=p_ga
                    )
                    pstate = init_train_state(params, opt_p)
                    t0 = time.perf_counter()
                    pstate, ploss = pstep(pstate, graph, pb, pew)
                    float(ploss)
                    pcompile = time.perf_counter() - t0
                    ptimes = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        pstate, ploss = pstep(pstate, graph, pb, pew)
                        float(ploss)
                        ptimes.append((time.perf_counter() - t0) * 1e3)
                    pms = sorted(ptimes)[len(ptimes) // 2]
                    log(f"pretrain step (bs 64, 512 negs, ga=8 no-remat): "
                        f"{pms:.0f} ms/step (compile+1st {pcompile:.0f}s)")
                    extra["pretrain_step_ms"] = round(pms, 1)
                    pstep = pstate = None
                except Exception as exc:  # noqa: BLE001
                    log(f"pretrain diagnostic skipped: "
                        f"{type(exc).__name__}: {exc}")

            # CLQA diagnostic: round-grouped executor forward on a mixed
            # 14-structure query batch (one query per BetaE type), eval
            # config (no dropout, precomputed relation reprs). One jit
            # launch per forward; direct warm medians.
            try:
                from ultra_tpu.query import ops as qops
                from ultra_tpu.query.executor import QueryConfig
                from ultra_tpu.query.trainer import make_query_forward_grouped
                from ultra_tpu.train.eval import (
                    precompute_relation_representations,
                )

                kind, operand = qops.decompose(
                    _clqa_mixed_batch(np.random.default_rng(3), V,
                                      2 * R_DIRECT)
                )
                qcfg = QueryConfig(dropout_ratio=0.0, threshold=0.8)
                rel_reprs = precompute_relation_representations(
                    params, cfg, graph
                )
                jax.block_until_ready(rel_reprs)
                fwd_grp = make_query_forward_grouped(cfg, qcfg)
                jax.block_until_ready(
                    fwd_grp(params, graph, kind, operand, rel_reprs)
                )  # compile warm-up
                qtimes = []
                for _ in range(6):
                    tq = time.perf_counter()
                    jax.block_until_ready(
                        fwd_grp(params, graph, kind, operand, rel_reprs)
                    )
                    qtimes.append(time.perf_counter() - tq)
                qmed = float(np.median(qtimes))
                qps = kind.shape[0] / qmed
                log(f"CLQA grouped eval fwd (mixed 14-type batch): "
                    f"{qmed*1e3:.0f} ms = {qps:.0f} q/s")
                extra["clqa_grouped_eval_qps"] = round(qps, 1)
            except Exception as exc:  # noqa: BLE001
                log(f"CLQA diagnostic skipped: {type(exc).__name__}: {exc}")

            # e2e filtered-eval diagnostic (round-5 headline): the REAL
            # eval loop (collect_rankings — host strict-mask building
            # pipelined with grouped device launches, cached relation
            # reprs, fused t+h scoring) over 256 triples; reported as
            # triples/s and extrapolated to FB15k-237's 20438-triple test
            # split (both directions). B/group per scripts/exp_eval_sweep.
            try:
                from ultra_tpu.train.eval import collect_rankings

                # B=8 won the round-5 sweep (evidence/r5/eval_sweep*.log):
                # fused dirs = F=1024, unsliced under the eval stream
                # budget; B=16 is equal per-row (kernel-bound), B=32 falls
                # to v1 (F=4096 > V2_MAX_F)
                ev_b, ev_g, n_ev = 8, 8, 256
                nd = ei.shape[1] // 2
                ev_index = tasks.GraphIndex.build(ei, et, V, 2 * R_DIRECT)
                ev_trips = np.stack(
                    [ei[0, :nd], ei[1, :nd], et[:nd]], axis=1,
                )[np.random.default_rng(5).choice(nd, size=n_ev,
                                                  replace=False)]
                collect_rankings(  # warm the jit caches
                    params, cfg, graph, ev_trips[: ev_b * ev_g], ev_index,
                    batch_size=ev_b, cache_relations=True,
                    dispatch_group=ev_g)
                t0 = time.perf_counter()
                collect_rankings(
                    params, cfg, graph, ev_trips, ev_index,
                    batch_size=ev_b, cache_relations=True,
                    dispatch_group=ev_g)
                ev_dt = time.perf_counter() - t0
                ev_tps = n_ev / ev_dt
                ev_split = 20438 / ev_tps
                log(f"e2e filtered eval (B={ev_b} group={ev_g}): "
                    f"{ev_tps:.1f} triples/s -> full FB test split "
                    f"{ev_split:.1f}s")
                extra["eval_triples_per_sec"] = round(ev_tps, 1)
                extra["eval_split_s"] = round(ev_split, 1)
            except Exception as exc:  # noqa: BLE001
                log(f"eval-split diagnostic skipped: "
                    f"{type(exc).__name__}: {exc}")
    except Exception as exc:  # noqa: BLE001
        log(f"e2e diagnostic skipped: {type(exc).__name__}: {exc}")

    opt = {
        k: round(eps[n], 1)
        for k, n in (
            ("v2_edges_per_sec", "realistic/v2"),
            ("uniform_edges_per_sec", "uniform/v2"),
            ("v1_edges_per_sec", "realistic/v1"),
            ("v2max_edges_per_sec", "realistic/v2max"),
            ("w3_edges_per_sec", "realistic/w3"),
            ("uniform_w3_edges_per_sec", "uniform/w3"),
            ("v2rg_edges_per_sec", "realistic/v2rg"),
            ("uniform_v2rg_edges_per_sec", "uniform/v2rg"),
        )
        if n in eps
    }
    if broken:
        opt["failed_configs"] = broken
    print(
        json.dumps(
            {
                "metric": "rspmm_edges_per_sec_chip",
                "value": round(headline, 1),
                "unit": "edges/s",
                "vs_baseline": round(headline / RTX3090_RSPMM_EDGES_PER_SEC, 3),
                "headline_config": headline_name,
                **opt,
                "iters": ITERS,
                "rounds": ROUNDS,
                **extra,
                "plans": all_stats,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        # One structured JSON line at rc=0 so the driver records a
        # distinguishable outage instead of a crash (VERDICT r2 weak #1).
        import traceback

        traceback.print_exc(file=sys.stderr)
        kind = (
            "tpu_unavailable"
            if isinstance(exc, BackendUnavailable)
            or "Unavailable" in str(exc)
            or "DEADLINE" in str(exc).upper()
            else "bench_error"
        )
        print(
            json.dumps(
                {
                    "metric": "rspmm_edges_per_sec_chip",
                    "value": None,
                    "unit": "edges/s",
                    "vs_baseline": None,
                    "error": kind,
                    "error_detail": f"{type(exc).__name__}: {str(exc)[:400]}",
                }
            ),
            flush=True,
        )
        sys.exit(0)
