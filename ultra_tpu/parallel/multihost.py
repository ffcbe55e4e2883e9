"""Multi-host (pod-slice) utilities: single-controller JAX initialization
and cross-process metric gathering.

Replaces the reference's NCCL bootstrap + zero-padded all_reduce concat
idiom (util.py:84-141, run.py:155-186): under JAX the global mesh spans all
processes' devices; gradient/boundary collectives ride ICI inside jit
(ultra_tpu/parallel/dp.py), and eval metric vectors gather with one
process_allgather over DCN.

Not exercisable on this single-host dev box — shapes and semantics are
covered by the virtual-mesh tests; run on a real slice via
``jax.distributed.initialize`` (auto-detected on Cloud TPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with TPU auto-detection; no-op if already
    initialized or single-process."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError:
        pass  # already initialized


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def gather_ranks(local: np.ndarray) -> np.ndarray:
    """Concatenate per-process 1D result vectors (rankings, counts) across
    hosts; every process returns the full array. Replaces the reference's
    size-exchange + zero-padded all_reduce trick (run.py:155-186)."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    local = np.asarray(local)
    # pad to the max local length, gather, then trim with gathered sizes
    sizes = multihost_utils.process_allgather(np.asarray([len(local)]))
    max_len = int(sizes.max())
    padded = np.zeros(max_len, dtype=local.dtype)
    padded[: len(local)] = local
    gathered = multihost_utils.process_allgather(padded)  # (P, max_len)
    return np.concatenate([gathered[i, : int(sizes[i, 0])] for i in range(len(sizes))])
