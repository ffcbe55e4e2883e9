"""Multi-host (pod-slice) utilities: single-controller JAX initialization,
per-process data loading, and cross-process metric gathering.

Replaces the reference's NCCL bootstrap + DistributedSampler + zero-padded
all_reduce concat idiom (util.py:84-141, run.py:32-34, run.py:155-186):
under JAX the global mesh spans all processes' devices; each process loads
only its shard of supervision triples/queries (shard_indices), lifts its
local batch into a global sharded jax.Array (host_local_batch_to_global),
gradient/boundary collectives ride ICI inside jit (ultra_tpu/parallel/dp.py),
and eval metric vectors gather with one process_allgather over DCN.

Exercised by a real 2-process CPU cluster in tests/test_multiprocess.py
(localhost Gloo coordinator); run on a real slice via
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


def per_process_rng(seed: int) -> np.random.Generator:
    """Rank-coupled RNG for negative sampling / shuffling, mirroring the
    reference's ``torch.manual_seed(seed + rank)`` (run.py:234)."""
    return np.random.default_rng(seed + jax.process_index())


def shard_indices(
    num_samples: int,
    epoch: int,
    seed: int = 0,
    shuffle: bool = True,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> np.ndarray:
    """This process's sample indices for one epoch — DistributedSampler
    semantics (run.py:32-34): every process draws the SAME epoch-seeded
    permutation, the index list is padded by wrapping so all ranks get equal
    counts (keeps global batch shapes static), and rank p takes the strided
    slice ``[p::P]``."""
    p = jax.process_index() if process_id is None else process_id
    world = jax.process_count() if num_processes is None else num_processes
    idx = np.arange(num_samples)
    if shuffle:
        idx = np.random.default_rng(seed + epoch).permutation(idx)
    total = -(-num_samples // world) * world
    if total > num_samples:
        idx = np.concatenate([idx, idx[: total - num_samples]])
    return idx[p::world]


def host_local_batch_to_global(mesh, local, spec=None):
    """Lift this process's local batch rows into a global jax.Array sharded
    over the mesh 'data' axis (leading dim). ``local`` on process p must hold
    rows ``[p*B/P, (p+1)*B/P)`` of the logical global batch (process-ordered
    concatenation along the sharded axis). Works single-process too (plain
    device_put with the same sharding), so train loops are process-count
    agnostic."""
    from jax.sharding import NamedSharding, PartitionSpec

    if spec is None:
        spec = PartitionSpec("data")
    local = np.asarray(local)
    if jax.process_count() == 1:
        return jax.device_put(local, NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(local, mesh, spec)


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
