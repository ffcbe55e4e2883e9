"""FULL-backend TPU compile checks, chipless (the round-3 upgrade of
test_tpu_lowering.py).

jax.experimental.topologies.get_topology_desc("v5e:1x1x1", "tpu",
chips_per_host_bounds=[1,1,1]) builds a compile-only v5e target from the
local libtpu; .lower(ShapeDtypeStruct-with-topology-sharding).compile()
then runs the ENTIRE chip compiler — including the Mosaic backend passes
(apply-vector-layout etc.) that the lowering tests stop short of. This is
exactly the pipeline the axon remote compile helper runs, with real error
messages instead of an HTTP 500.

Round-3 on-chip findings this guards (scripts/aot_compile_probe.py):
  - tpu.dynamic_gather only handles ONE source vreg along the gather dim:
    8 sublanes (axis 0) / 128 lanes (axis 1) — the w3 / v2rg window
    gathers (1024 rows) fail "Multiple source vregs along gather
    dimension".
  - 16-bit gathers are unreachable: indices canonicalize to i32 and the
    backend requires matching data/index bitwidths ("Gather indices and
    result have different bitwidths").
  - make_async_copy slices must be 8-row aligned ("Slice shape along
    dimension 0 must be aligned to tiling (8)") — no per-row DMA gather.

The xfail tests below pin those exact errors so a jaxlib/libtpu upgrade
that lifts them shows up as XPASS (re-measure w3/v2rg then).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import SingleDeviceSharding

from ultra_tpu.graph import make_graph
from ultra_tpu.ops.rspmm import rspmm_from_graph
from ultra_tpu.ops.rspmm_pallas import attach_plans


@pytest.fixture(scope="module")
def v5e_sharding():
    from jax.experimental import topologies

    try:
        topo = topologies.get_topology_desc(
            "v5e:1x1x1", "tpu", chips_per_host_bounds=[1, 1, 1]
        )
    except Exception as exc:  # noqa: BLE001 — no local libtpu
        pytest.skip(f"chipless TPU topology unavailable: {exc}")
    return SingleDeviceSharding(topo.devices[0])


@pytest.fixture()
def force_mosaic(monkeypatch):
    import ultra_tpu.ops.rspmm_pallas as rp
    import ultra_tpu.ops.rspmm_pallas_v2 as v2m
    import ultra_tpu.ops.rspmm_pallas_w3 as w3m

    for mod in (rp, v2m, w3m):
        monkeypatch.setattr(mod, "_interpret", lambda: False)


@pytest.fixture()
def graph_and_shapes():
    rng = np.random.default_rng(0)
    v, r, e = 900, 20, 4000
    ei = rng.integers(0, v, size=(2, e)).astype(np.int64)
    et = rng.integers(0, r, size=e).astype(np.int64)
    graph = make_graph(ei, et, num_nodes=v, num_relations=r, pad_to=e + 16)
    return graph, (r, 2, 64), (v, 2, 64)


def _compile_grad(sharding, graph, rel_shape, x_shape, agg, mul):
    def loss(rel, x):
        out = rspmm_from_graph(graph, rel, x, sum=agg, mul=mul)
        return jnp.sum(jnp.where(jnp.isfinite(out), jnp.sin(out), 0.0))

    rel_s = jax.ShapeDtypeStruct(rel_shape, jnp.float32, sharding=sharding)
    x_s = jax.ShapeDtypeStruct(x_shape, jnp.float32, sharding=sharding)
    jax.jit(jax.grad(loss, argnums=(0, 1))).lower(rel_s, x_s).compile()


@pytest.mark.parametrize(
    "agg,mul", [("add", "mul"), ("add", "add"), ("max", "mul"), ("min", "add")]
)
def test_v2_paths_chip_compile(force_mosaic, v5e_sharding, graph_and_shapes,
                               agg, mul):
    graph, rel_shape, x_shape = graph_and_shapes
    graph = attach_plans(graph, w3=False)
    assert graph.plans.v2 is not None
    _compile_grad(v5e_sharding, graph, rel_shape, x_shape, agg, mul)


def test_v1_paths_chip_compile(force_mosaic, v5e_sharding, graph_and_shapes):
    graph, rel_shape, x_shape = graph_and_shapes
    graph = attach_plans(graph, v2=False, w3=False)
    _compile_grad(v5e_sharding, graph, rel_shape, x_shape, "add", "mul")
    _compile_grad(v5e_sharding, graph, rel_shape, x_shape, "max", "mul")


@pytest.mark.xfail(
    reason="Mosaic: 'Multiple source vregs along gather dimension' / "
    "'Gather indices and result have different bitwidths' — >8-row "
    "same-shape gathers are unimplemented in this backend (round-3 "
    "probes). XPASS => backend upgrade lifted it: re-measure w3/v2rg.",
    strict=True,
)
def test_w3_chip_compile_closed(force_mosaic, v5e_sharding, graph_and_shapes):
    graph, rel_shape, x_shape = graph_and_shapes
    graph = attach_plans(graph, w3=True, w3_window=256)
    if graph.plans.w3 is None:
        pytest.skip("w3 gated off by pad waste on this random graph")
    _compile_grad(v5e_sharding, graph, rel_shape, x_shape, "add", "mul")


@pytest.mark.xfail(
    reason="Mosaic: same >8-row gather limitation as w3 (round-3 probes). "
    "XPASS => backend upgrade lifted it: re-measure v2rg.",
    strict=True,
)
def test_v2rg_chip_compile_closed(force_mosaic, v5e_sharding,
                                  graph_and_shapes, monkeypatch):
    monkeypatch.setenv("ULTRA_V2_RELGATHER", "1")
    graph, rel_shape, x_shape = graph_and_shapes
    graph = attach_plans(graph, w3=False, v2_chunk=128)
    assert graph.plans.v2rg is not None
    _compile_grad(v5e_sharding, graph, rel_shape, x_shape, "add", "mul")
