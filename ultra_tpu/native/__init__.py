"""Native (C++) host kernels, JIT-compiled at first use with g++ and loaded
via ctypes — mirrors the reference's cpp_extension flow (rspmm.py:181-207)
without a torch dependency. Falls back to the numpy implementations when no
compiler is available."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path(name: str) -> str:
    return os.path.join(os.path.dirname(__file__), name)


def _cache_dir() -> str:
    d = os.environ.get(
        "ULTRA_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ultra_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed cache) and load the native library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path("relgraph.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_cache_dir(), f"relgraph_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.relgraph_build.restype = ctypes.c_int64
        lib.relgraph_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.relgraph_fetch.argtypes = [ctypes.c_void_p] * 3
        _LIB = lib
    except Exception:  # noqa: BLE001 — fall back to numpy silently
        _LIB = None
    return _LIB


def relgraph_build_native(
    edge_index: np.ndarray, edge_type: np.ndarray, num_nodes: int, num_relations: int,
    live: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ relation-graph construction; returns (edge_index (2, M), type (M,))
    or None if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    heads = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    tails = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    types = np.ascontiguousarray(edge_type, dtype=np.int64)
    live_arr = (
        np.ascontiguousarray(live, dtype=np.uint8) if live is not None else None
    )
    n = lib.relgraph_build(
        heads.ctypes.data, tails.ctypes.data, types.ctypes.data,
        live_arr.ctypes.data if live_arr is not None else None,
        heads.size, int(num_nodes), int(num_relations),
    )
    src = np.empty(n, dtype=np.int64)
    dst = np.empty(n, dtype=np.int64)
    typ = np.empty(n, dtype=np.int64)
    lib.relgraph_fetch(src.ctypes.data, dst.ctypes.data, typ.ctypes.data)
    return np.stack([src, dst]), typ
