"""HTTP serving layer: endpoints answer over a live socket and agree with
direct predictor/executor calls; malformed input gets 400, not 500."""

import json
import threading
from http.client import HTTPConnection

import jax
import numpy as np
import pytest

from ultra_tpu.data.synthetic import synthetic_graph
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.serve import UltraPredictor
from ultra_tpu.server import PredictionService, make_http_server
from ultra_tpu.train.loop import init_ultra_params


@pytest.fixture(scope="module")
def service():
    graph, ei, et = synthetic_graph(
        num_nodes=30, num_direct_rel=4, num_triples=120, seed=1
    )
    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16, 16), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16, 16), num_relation=1,
            project_relations=True,
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    pred = UltraPredictor(params, cfg, graph, batch_size=4)
    return PredictionService(
        pred, entity_names=[f"ent{i}" for i in range(graph.num_nodes)]
    )


@pytest.fixture(scope="module")
def server(service):
    httpd = make_http_server(service, port=0)  # free port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _req(addr, method, path, payload=None):
    conn = HTTPConnection(*addr, timeout=120)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_healthz_and_meta(server, service):
    status, out = _req(server, "GET", "/healthz")
    assert (status, out) == (200, {"status": "ok"})
    status, out = _req(server, "GET", "/v1/meta")
    assert status == 200
    assert out["num_entities"] == 30 and out["num_relations_direct"] == 4
    assert out["has_entity_names"]


def test_predict_matches_direct_call(server, service):
    status, out = _req(server, "POST", "/v1/predict", {
        "queries": [
            {"head": 0, "relation": 1, "k": 5},
            {"head": 5, "relation": 3, "k": 3, "mode": "head"},
        ]
    })
    assert status == 200, out
    res = out["results"]
    assert len(res[0]["entities"]) == 5 and len(res[1]["entities"]) == 3

    s_t, i_t = service.predictor.predict_tails([0], [1], k=5)
    np.testing.assert_array_equal(res[0]["entities"], i_t[0])
    np.testing.assert_allclose(res[0]["scores"], s_t[0], rtol=1e-4, atol=1e-5)
    assert res[0]["entity_names"][0] == f"ent{i_t[0, 0]}"
    # head mode rides the inverse relation
    s_h, i_h = service.predictor.predict_heads([5], [3], k=3)
    np.testing.assert_array_equal(res[1]["entities"], i_h[0][:3])


def test_clqa_query_endpoint(server, service):
    # 2i intersection in BetaE nesting: [[e, [r]], [e, [r]]]
    status, out = _req(server, "POST", "/v1/query", {
        "queries": [[[3, [1]], [7, [2]]], [0, [1, 3]]], "k": 4,
    })
    assert status == 200, out
    res = out["results"]
    assert len(res) == 2
    for r in res:
        assert len(r["entities"]) == 4
        assert all(0.0 <= p <= 1.0 for p in r["probs"])
        assert r["probs"] == sorted(r["probs"], reverse=True)

    # parity vs the grouped executor called directly
    from ultra_tpu.query import ops as qops

    progs = [
        qops.from_nested(((3, (1,)), (7, (2,)))),
        qops.from_nested((0, (1, 3))),
    ]
    kind, operand = qops.decompose(qops.pad_queries(progs, 8))
    fwd, rel_reprs = service._query_forward()
    pred = np.asarray(fwd(
        service.predictor.params, service.predictor.graph, kind, operand,
        rel_reprs,
    ))
    prob = 1.0 / (1.0 + np.exp(-pred.astype(np.float64)))
    for i, r in enumerate(res):
        order = np.argsort(-prob[i])[:4]
        np.testing.assert_array_equal(r["entities"], order)
        np.testing.assert_allclose(r["probs"], prob[i][order], rtol=1e-4,
                                   atol=1e-6)


def test_error_paths(server):
    status, out = _req(server, "POST", "/v1/predict", {"queries": []})
    assert status == 400 and "non-empty" in out["error"]
    status, out = _req(server, "POST", "/v1/predict",
                       {"queries": [{"head": 99, "relation": 0}]})
    assert status == 400 and "out of range" in out["error"]
    status, out = _req(server, "POST", "/v1/predict",
                       {"queries": [{"head": 0, "relation": 7}]})
    assert status == 400 and "relation" in out["error"]
    # malformed k: 400, not 500 (and not silently-empty results)
    status, out = _req(server, "POST", "/v1/predict",
                       {"queries": [{"head": 0, "relation": 1, "k": "five"}]})
    assert status == 400 and "'k'" in out["error"]
    status, out = _req(server, "POST", "/v1/predict",
                       {"queries": [{"head": 0, "relation": 1, "k": -3}]})
    assert status == 400
    status, out = _req(server, "POST", "/v1/query", {"queries": ["nope"]})
    assert status == 400
    # out-of-range ids inside a BetaE program must 400 (a device gather
    # would silently clamp them)
    status, out = _req(server, "POST", "/v1/query",
                       {"queries": [[99999, [1]]]})
    assert status == 400 and "entity id" in out["error"]
    status, out = _req(server, "POST", "/v1/query",
                       {"queries": [[0, [-5]]]})
    assert status == 400
    status, out = _req(server, "POST", "/v1/query",
                       {"queries": [[0, [1] * 40]]})
    assert status == 400 and "too long" in out["error"]
    status, out = _req(server, "GET", "/v1/nope")
    assert status == 404


def test_meta_counts_requests(server):
    status, before = _req(server, "GET", "/v1/meta")
    _req(server, "POST", "/v1/predict",
         {"queries": [{"head": 1, "relation": 0}]})
    status, after = _req(server, "GET", "/v1/meta")
    assert after["requests"] == before["requests"] + 1
    assert after["latency_ms"]["p50"] is not None


def test_concurrent_requests_no_errors(server):
    """ThreadingHTTPServer runs handlers in parallel threads — hammer
    predict + query + meta concurrently; every response must be 200 (the
    lock serializes device work; meta snapshots stats under the lock)."""
    import concurrent.futures

    def one(i):
        kind = i % 3
        if kind == 0:
            return _req(server, "POST", "/v1/predict",
                        {"queries": [{"head": i % 30, "relation": i % 4,
                                      "k": 5}]})[0]
        if kind == 1:
            return _req(server, "POST", "/v1/query",
                        {"queries": [[i % 30, [i % 8]]], "k": 3})[0]
        return _req(server, "GET", "/v1/meta")[0]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        statuses = list(ex.map(one, range(24)))
    assert statuses == [200] * 24, statuses


def test_validation_edge_cases(server, service):
    # non-object JSON body -> 400, not AttributeError/500
    status, out = _req(server, "POST", "/v1/predict", [1, 2])
    assert status == 400 and "JSON object" in out["error"]
    status, out = _req(server, "POST", "/v1/query", [1, 2])
    assert status == 400
    # int32-wrapping / opcode-aliasing ids must 400, not answer for the
    # wrapped id (2**32 + 5 wraps to 5 in decompose's int32 extraction)
    status, out = _req(server, "POST", "/v1/query",
                       {"queries": [[2**32 + 5, [1]]]})
    assert status == 400 and "2**31" in out["error"]
    status, out = _req(server, "POST", "/v1/query",
                       {"queries": [[0, [2**58 + 1]]]})
    assert status == 400
    # k larger than every bucket on a small graph: bucket clamps to V and
    # the request succeeds (V=30 here; bucket 100 would crash lax.top_k)
    status, out = _req(server, "POST", "/v1/predict",
                       {"queries": [{"head": 0, "relation": 1, "k": 11}]})
    assert status == 200, out
    assert len(out["results"][0]["entities"]) == 11
