"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), which must stay free for benchmarks and is slow for per-op dispatch.
# Also drop the PJRT plugin env vars entirely — merely *registering* the axon
# plugin opens a tunnel handshake that intermittently stalls CPU-only runs.
os.environ["JAX_PLATFORMS"] = "cpu"
for _v in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
    os.environ.pop(_v, None)


def _drop_tpu_plugin():
    """The container's sitecustomize registers the tunneled-TPU ('axon') PJRT
    plugin in every interpreter; even unused it intermittently stalls CPU
    runs. Deregister the factory before any backend initializes."""
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)


_drop_tpu_plugin()
import jax

# sitecustomize imports jax before us, so JAX_PLATFORMS=axon is already
# captured in the config — override it there, not just in the environment.
jax.config.update("jax_platforms", "cpu")
# jax >= 0.5 replaces --xla_force_host_platform_device_count with this config.
jax.config.update("jax_num_cpu_devices", 8)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
