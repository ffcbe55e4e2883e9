"""HTTP serving front end: link prediction + CLQA over a warm jit cache.

The reference ships research scripts only; this is the production-serving
counterpart (stdlib-only, no extra dependencies): a ThreadingHTTPServer
whose handlers funnel device work through one lock (a single chip runs one
program at a time anyway — serializing keeps tail latency predictable and
jit caches warm), with request batching delegated to UltraPredictor
(serve.py). Endpoints:

  GET  /healthz      -> {"status": "ok"}
  GET  /v1/meta      -> graph/model dims + request counters + latency stats
  POST /v1/predict   -> {"queries": [{"head": id, "relation": id,
                         "mode": "tail"|"head", "k": 10}]}
                        mode "head" scores via the inverse relation
                        (base_nbfnet.py:79-86), k buckets the jit cache.
  POST /v1/query     -> {"queries": [<BetaE nested list>], "k": 10}
                        e.g. [[3, [1]], [7, [2]]] = 2i; -2 = negation —
                        compiled through query/ops.from_nested and answered
                        by the round-grouped executor (zero-shot CLQA).

Measured single-chip latency (v5e, FB15k-237 shape, real ultra_3g): p50
73 ms/query at bs 1, 95 ms for a batch of 8 (docs/DEPLOYMENT.md §5).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np


class BadRequest(ValueError):
    pass


def _as_tuples(nested):
    """JSON lists -> the tuples query/ops.from_nested expects."""
    if isinstance(nested, list):
        return tuple(_as_tuples(v) for v in nested)
    return nested


class PredictionService:
    """Transport-free core (also usable directly in tests / notebooks)."""

    def __init__(
        self,
        predictor,
        qcfg=None,
        entity_names: Optional[Sequence[str]] = None,
        relation_names: Optional[Sequence[str]] = None,
        max_batch: int = 64,
        query_len_buckets: Sequence[int] = (8, 16),
    ):
        self.predictor = predictor
        self.entity_names = list(entity_names) if entity_names else None
        self.relation_names = list(relation_names) if relation_names else None
        self.max_batch = max_batch
        self.query_len_buckets = tuple(sorted(query_len_buckets))
        self._lock = threading.Lock()
        self._latencies = deque(maxlen=4096)
        self._requests = 0
        self._started = time.time()
        self._qfwd = None
        self._qcfg = qcfg
        self._k_buckets = (1, 10, 100)

    def _parse_k(self, raw, where: str) -> int:
        try:
            k = int(raw)
        except (TypeError, ValueError):
            raise BadRequest(f"{where}: 'k' must be an integer")
        if k < 1:
            raise BadRequest(f"{where}: 'k' must be >= 1")
        return min(k, self.predictor.graph.num_nodes)

    def _bucket_k(self, k: int) -> int:
        # client-controlled k is a STATIC jit arg — bucket it so a client
        # cycling k values cannot grow the executable cache unboundedly.
        # Clamp the bucket to V: lax.top_k(k > size) raises (a V=30 graph
        # must not 500 on k=11 because bucket 100 > 30)
        v = self.predictor.graph.num_nodes
        return min(next((b for b in self._k_buckets if b >= k), v), v)

    @staticmethod
    def _payload_dict(payload) -> dict:
        if not isinstance(payload, dict):
            raise BadRequest("body must be a JSON object")
        return payload

    def _record(self, dt_ms: float) -> None:
        with self._lock:
            self._latencies.append(dt_ms)
            self._requests += 1

    # -- link prediction ---------------------------------------------------

    def predict(self, payload: dict) -> dict:
        queries = self._payload_dict(payload).get("queries")
        if not isinstance(queries, list) or not queries:
            raise BadRequest("body must be {'queries': [..]} (non-empty)")
        if len(queries) > self.max_batch:
            raise BadRequest(f"max {self.max_batch} queries per request")
        num_rel = self.predictor.graph.num_relations
        num_direct = num_rel // 2
        v = self.predictor.graph.num_nodes
        h, r, ks = [], [], []
        for i, q in enumerate(queries):
            try:
                head = int(q["head"])
                rel = int(q["relation"])
            except (KeyError, TypeError, ValueError):
                raise BadRequest(f"query {i}: need integer 'head' and 'relation'")
            mode = q.get("mode", "tail")
            if mode not in ("tail", "head"):
                raise BadRequest(f"query {i}: mode must be 'tail' or 'head'")
            if not 0 <= head < v:
                raise BadRequest(f"query {i}: head {head} out of range [0, {v})")
            if not 0 <= rel < num_direct:
                raise BadRequest(
                    f"query {i}: relation {rel} out of range [0, {num_direct}) "
                    "(direct relations; head-mode adds the inverse internally)"
                )
            h.append(head)
            r.append(rel + num_direct if mode == "head" else rel)
            ks.append(self._parse_k(q.get("k", 10), f"query {i}"))
        k = self._bucket_k(max(ks))  # per-query k trims below
        t0 = time.perf_counter()
        with self._lock:
            scores, tails = self.predictor.predict_tails(h, r, k=k)
        dt = (time.perf_counter() - t0) * 1e3
        self._record(dt)
        results = []
        for i in range(len(queries)):
            ki = ks[i]
            ent = tails[i, :ki].tolist()
            res = {
                "entities": ent,
                "scores": [round(float(s), 6) for s in scores[i, :ki]],
            }
            if self.entity_names:
                res["entity_names"] = [self.entity_names[e] for e in ent]
            results.append(res)
        return {"results": results, "latency_ms": round(dt, 2)}

    # -- CLQA --------------------------------------------------------------

    def _query_forward(self):
        # lazy init under the device lock: two concurrent first queries
        # must not build two closures (each owns a jit cache) or dispatch
        # the rel-repr precompute concurrently with locked device work
        with self._lock:
            if self._qfwd is None:
                from ultra_tpu.query.executor import QueryConfig
                from ultra_tpu.query.trainer import make_query_forward_grouped
                from ultra_tpu.train.eval import (
                    precompute_relation_representations,
                )

                qcfg = self._qcfg or QueryConfig(dropout_ratio=0.0, threshold=0.8)
                fwd = make_query_forward_grouped(self.predictor.cfg, qcfg)
                rel_reprs = getattr(self.predictor, "rel_reprs", None)
                if rel_reprs is None:
                    rel_reprs = precompute_relation_representations(
                        self.predictor.params, self.predictor.cfg,
                        self.predictor.graph,
                    )
                self._qfwd = (fwd, rel_reprs)
            return self._qfwd

    @staticmethod
    def _raw_ids_ok(nested) -> bool:
        """Every int in the nested query must sit in [-2, 2**31): negative
        ids (except the -2 negation marker) corrupt the opcode bits
        (query/ops.py:18-24), ids >= 2**31 wrap in decompose's int32
        operand extraction, and ids >= 2**58 alias opcode bits — all three
        would dodge the post-decode range checks below."""
        if isinstance(nested, tuple):
            return all(PredictionService._raw_ids_ok(x) for x in nested)
        return isinstance(nested, int) and -2 <= nested < 2**31

    def query(self, payload: dict) -> dict:
        from ultra_tpu.query import ops as qops

        queries = self._payload_dict(payload).get("queries")
        if not isinstance(queries, list) or not queries:
            raise BadRequest("body must be {'queries': [..]} (non-empty)")
        if len(queries) > self.max_batch:
            raise BadRequest(f"max {self.max_batch} queries per request")
        k = self._parse_k(payload.get("k", 10), "body")
        v = self.predictor.graph.num_nodes
        num_rel = self.predictor.graph.num_relations  # incl. inverses (BetaE)
        progs = []
        for i, q in enumerate(queries):
            if not isinstance(q, list):
                raise BadRequest(f"query {i}: must be a BetaE nested list")
            nested = _as_tuples(q)
            if not self._raw_ids_ok(nested):
                raise BadRequest(
                    f"query {i}: ids must be ints in [0, 2**31) "
                    "(-2 = negation marker inside a unary-op list)"
                )
            try:
                prog = qops.from_nested(nested)
            except Exception as exc:  # noqa: BLE001
                raise BadRequest(f"query {i}: not a BetaE nested query ({exc})")
            # validate decoded operands — an out-of-range id would be
            # silently clamped by the device gather
            if (prog < 0).any():
                raise BadRequest(
                    f"query {i}: negative ids are invalid (-2 is only "
                    "valid inside a unary-op list, meaning negation)"
                )
            kind_i, op_i = qops.decompose(prog[None, :])
            ent_ok = op_i[kind_i == qops.K_OPERAND]
            rel_ok = op_i[kind_i == qops.K_PROJECTION]
            if ent_ok.size and (ent_ok.min() < 0 or ent_ok.max() >= v):
                raise BadRequest(f"query {i}: entity id out of range [0, {v})")
            if rel_ok.size and (rel_ok.min() < 0 or rel_ok.max() >= num_rel):
                raise BadRequest(
                    f"query {i}: relation id out of range [0, {num_rel})"
                )
            progs.append(prog)
        max_len = max(p.shape[0] for p in progs)
        bucket = next(
            (b for b in self.query_len_buckets if b >= max_len), max_len
        )
        if bucket > self.query_len_buckets[-1]:
            raise BadRequest(
                f"query too long ({max_len} ops; max "
                f"{self.query_len_buckets[-1]})"
            )
        # bucket the BATCH size too: client-controlled shapes are static
        # jit args — power-of-two buckets keep the executable cache bounded
        pad_prog = np.array([0, qops.PROJECTION | 0, qops.STOP], np.int64)
        n_real = len(progs)
        n_bucket = 1
        while n_bucket < n_real:
            n_bucket *= 2
        progs = progs + [pad_prog] * (n_bucket - n_real)
        kind, operand = qops.decompose(qops.pad_queries(progs, bucket))
        fwd, rel_reprs = self._query_forward()
        t0 = time.perf_counter()
        with self._lock:
            pred = np.asarray(
                fwd(self.predictor.params, self.predictor.graph, kind, operand,
                    rel_reprs)
            )[:n_real]
        dt = (time.perf_counter() - t0) * 1e3
        self._record(dt)
        # the executor's final stack value is a logit (trained with
        # sigmoid-BCE, query/trainer.py); answer probability = sigmoid,
        # matching evaluate_queries' num_pred accounting
        prob = 1.0 / (1.0 + np.exp(-pred.astype(np.float64)))
        order = np.argsort(-prob, axis=1)[:, :k]
        results = []
        for i in range(len(queries)):
            ent = order[i].tolist()
            res = {
                "entities": ent,
                "probs": [round(float(p), 6) for p in prob[i, order[i]]],
            }
            if self.entity_names:
                res["entity_names"] = [self.entity_names[e] for e in ent]
            results.append(res)
        return {"results": results, "latency_ms": round(dt, 2)}

    # -- meta --------------------------------------------------------------

    def meta(self) -> dict:
        with self._lock:  # _latencies mutates on request threads
            lat = sorted(self._latencies)
            requests = self._requests
        pct = lambda p: round(lat[int(p * (len(lat) - 1))], 2) if lat else None  # noqa: E731
        g = self.predictor.graph
        return {
            "num_entities": int(g.num_nodes),
            "num_relations_direct": int(g.num_relations // 2),
            "batch_size": self.predictor.batch_size,
            "requests": requests,
            "uptime_s": round(time.time() - self._started, 1),
            "latency_ms": {"p50": pct(0.5), "p90": pct(0.9), "p99": pct(0.99)},
            "has_entity_names": bool(self.entity_names),
        }


def make_http_server(service: PredictionService, host: str = "127.0.0.1",
                     port: int = 8080) -> ThreadingHTTPServer:
    """Bind (port 0 picks a free one; .server_address has the result)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # route through logging, not stderr spam
            pass

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/v1/meta":
                    self._send(200, service.meta())
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as exc:  # noqa: BLE001
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

        def do_POST(self):
            routes = {"/v1/predict": service.predict, "/v1/query": service.query}
            fn = routes.get(self.path)
            if fn is None:
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, fn(payload))
            except BadRequest as exc:
                self._send(400, {"error": str(exc)})
            except json.JSONDecodeError as exc:
                self._send(400, {"error": f"bad JSON: {exc}"})
            except Exception as exc:  # noqa: BLE001
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return ThreadingHTTPServer((host, port), Handler)
