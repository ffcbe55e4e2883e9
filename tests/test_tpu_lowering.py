"""AOT-lower every Pallas kernel path for the TPU platform (on CPU).

jax.jit(...).trace(...).lower(lowering_platforms=("tpu",)) runs the full
Pallas -> Mosaic MLIR conversion — the stage where unsupported ops fail
(the round-2 VMEM-gather probes all died here) — without needing a chip.
This catches Mosaic-lowering regressions offline; only the chip-side
Mosaic compile (apply-vector-layout and beyond) remains hardware-gated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_tpu.graph import make_graph
from ultra_tpu.ops.rspmm import rspmm_from_graph
from ultra_tpu.ops.rspmm_pallas import attach_plans


@pytest.fixture()
def force_mosaic(monkeypatch):
    """Disable interpret mode so the real Mosaic lowering path runs."""
    import ultra_tpu.ops.rspmm_pallas as rp
    import ultra_tpu.ops.rspmm_pallas_v2 as v2m
    import ultra_tpu.ops.rspmm_pallas_w3 as w3m

    for mod in (rp, v2m, w3m):
        monkeypatch.setattr(mod, "_interpret", lambda: False)


@pytest.fixture()
def graph_and_inputs():
    rng = np.random.default_rng(0)
    v, r, e = 900, 20, 4000
    ei = rng.integers(0, v, size=(2, e)).astype(np.int64)
    et = rng.integers(0, r, size=e).astype(np.int64)
    graph = make_graph(ei, et, num_nodes=v, num_relations=r, pad_to=e + 16)
    rel = jnp.asarray(rng.normal(size=(r, 2, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(v, 2, 64)).astype(np.float32))
    return graph, rel, x


def _lower_grad(graph, rel, x, agg, mul):
    def loss(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum=agg, mul=mul)
        return jnp.sum(jnp.where(jnp.isfinite(out), jnp.sin(out), 0.0))

    jax.jit(jax.grad(loss, argnums=(0, 1))).trace(rel, x).lower(
        lowering_platforms=("tpu",)
    )


@pytest.mark.parametrize(
    "agg,mul", [("add", "mul"), ("add", "add"), ("max", "mul"), ("min", "add")]
)
def test_v2_paths_lower_for_tpu(force_mosaic, graph_and_inputs, agg, mul):
    graph, rel, x = graph_and_inputs
    graph = attach_plans(graph, w3=False)
    assert graph.plans.v2 is not None
    _lower_grad(graph, rel, x, agg, mul)


@pytest.mark.parametrize("agg,mul", [("add", "mul"), ("add", "add")])
def test_w3_paths_lower_for_tpu(force_mosaic, graph_and_inputs, agg, mul):
    graph, rel, x = graph_and_inputs
    graph = attach_plans(graph, w3=True, w3_window=256)
    if graph.plans.w3 is None:
        pytest.skip("w3 gated off by pad waste on this random graph")
    _lower_grad(graph, rel, x, agg, mul)


def test_v1_paths_lower_for_tpu(force_mosaic, graph_and_inputs):
    graph, rel, x = graph_and_inputs
    graph = attach_plans(graph, v2=False, w3=False)
    _lower_grad(graph, rel, x, "add", "mul")
    _lower_grad(graph, rel, x, "max", "mul")


def test_v2_rel_gather_lowers_for_tpu(force_mosaic, graph_and_inputs, monkeypatch):
    monkeypatch.setenv("ULTRA_V2_RELGATHER", "1")
    graph, rel, x = graph_and_inputs
    graph = attach_plans(graph, w3=False, v2_chunk=128)
    assert graph.plans.v2rg is not None
    _lower_grad(graph, rel, x, "add", "mul")
