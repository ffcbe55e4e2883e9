"""Chipless full-backend TPU compile probes (Mosaic included).

jax.experimental.topologies.get_topology_desc('v5e:1x1x1', 'tpu',
chips_per_host_bounds=[1,1,1]) + .lower(shapes-with-topology-sharding)
.compile() runs the SAME TpuAotCompiler pipeline the axon remote helper
uses — locally, with no device lock and with real error messages (the
tunnel helper swallows them into an HTTP 500).

This answers, with exact Mosaic errors, which in-kernel gather forms this
backend accepts:
  - per-row DMA gather (scalar-prefetch indices -> make_async_copy rows)
  - same-shape take_along_axis axis=0 (sublane dynamic_gather): f32/i32,
    bf16/i32, bf16/i16, and the within-tile (8-row) variant
  - same-shape take_along_axis axis=1 at 128 lanes (known-good control)

Usage: python scripts/aot_compile_probe.py   (CPU-only, safe anytime)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax._src.xla_bridge._backend_factories.pop("axon", None)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental import topologies
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import SingleDeviceSharding

TOPO = topologies.get_topology_desc(
    "v5e:1x1x1", "tpu", chips_per_host_bounds=[1, 1, 1]
)
SHARD = SingleDeviceSharding(TOPO.devices[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def aot_compile(name, f, *shapes):
    """Compile f for the v5e topology; returns True/False and logs the
    root-cause line of any failure."""
    args = [jax.ShapeDtypeStruct(s, d, sharding=SHARD) for s, d in shapes]
    try:
        jax.jit(f).lower(*args).compile()
        log(f"{name}: COMPILE OK")
        return True
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        root = next(
            (ln for ln in msg.splitlines() if "Not implemented" in ln
             or "not implemented" in ln or "Unsupported" in ln
             or "INTERNAL" in ln or "failed" in ln),
            msg.splitlines()[0] if msg else type(exc).__name__,
        )
        log(f"{name}: FAILED {type(exc).__name__}: {root[:300]}")
        return False


# --- row-DMA gather -----------------------------------------------------------


def make_dma_sp(c, F, k):
    def kernel(idx_ref, x_any, o_ref, sems):
        pid = pl.program_id(0)
        base = pid * c
        for i in range(c):
            pltpu.make_async_copy(
                x_any.at[pl.ds(idx_ref[base + i], 1), :],
                o_ref.at[pl.ds(i, 1), :],
                sems.at[i],
            ).start()
        for i in range(c):
            pltpu.make_async_copy(
                x_any.at[pl.ds(idx_ref[base + i], 1), :],
                o_ref.at[pl.ds(i, 1), :],
                sems.at[i],
            ).wait()

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((c, F), lambda i, idx: (i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((c,))],
        ),
        out_shape=jax.ShapeDtypeStruct((k * c, F), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


# --- same-shape gathers ---------------------------------------------------------


def make_same_shape_axis0(c, F, k, dtype, idx_dtype):
    def kernel(idx_ref, w_ref, o_ref):
        idx = idx_ref[pl.ds(jax.lax.rem(pl.program_id(0), 8), 1), :][0]
        idx2d = jnp.broadcast_to(idx[:, None], (c, F)).astype(idx_dtype)
        o_ref[:] = jnp.take_along_axis(w_ref[:], idx2d, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((8, c), lambda i: (i // 8, 0)),
            pl.BlockSpec((c, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((k * c, F), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def make_lane_gather(m, lanes, dtype):
    def kernel(idx_ref, w_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(w_ref[:], idx_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((m, lanes), lambda i: (0, 0)),
            pl.BlockSpec((m, lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, lanes), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, lanes), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def main():
    F, c, k = 512, 256, 16
    aot_compile(
        "A2 row-DMA sp c=256", make_dma_sp(c, F, k),
        ((k * c,), jnp.int32), ((14592, F), jnp.bfloat16),
    )
    aot_compile(
        "B axis0 f32/i32 C=256", make_same_shape_axis0(c, F, k, jnp.float32, jnp.int32),
        ((max(8, k // 8 * 8), c), jnp.int32), ((c, F), jnp.float32),
    )
    aot_compile(
        "B axis0 bf16/i32 C=256", make_same_shape_axis0(c, F, k, jnp.bfloat16, jnp.int32),
        ((max(8, k // 8 * 8), c), jnp.int32), ((c, F), jnp.bfloat16),
    )
    aot_compile(
        "B axis0 bf16/i16 C=256", make_same_shape_axis0(c, F, k, jnp.bfloat16, jnp.int16),
        ((max(8, k // 8 * 8), c), jnp.int32), ((c, F), jnp.bfloat16),
    )
    aot_compile(
        "B axis0 f32/i32 C=8 (within-tile)",
        make_same_shape_axis0(8, F, 16, jnp.float32, jnp.int32),
        ((16, 8), jnp.int32), ((8, F), jnp.float32),
    )
    aot_compile(
        "C axis1 f32 128 lanes (control)", make_lane_gather(512, 128, jnp.float32),
        ((512, 128), jnp.int32), ((512, 128), jnp.float32),
    )
    aot_compile(
        "C axis1 bf16/i32 128 lanes", make_lane_gather(512, 128, jnp.bfloat16),
        ((512, 128), jnp.int32), ((512, 128), jnp.bfloat16),
    )


if __name__ == "__main__":
    main()
