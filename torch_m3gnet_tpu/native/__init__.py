"""Native (C++) host components, built on first use and bound via ctypes.

The reference delegates its host-side inner loops to external native libraries
(pymatgen neighbor kernels, torch-scatter); this package provides in-repo
equivalents. Falls back to the pure-numpy implementations if the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "neighbor.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_libm3gnative.so")


def _load() -> ctypes.CDLL | None:
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.m3g_neighbor_list.restype = ctypes.c_int64
            lib.m3g_neighbor_list.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # lattice
                ctypes.POINTER(ctypes.c_double),  # pos
                ctypes.c_int64,  # n
                ctypes.c_double,  # cutoff
                ctypes.c_int64,  # cap
                ctypes.POINTER(ctypes.c_int64),  # src
                ctypes.POINTER(ctypes.c_int64),  # dst
                ctypes.POINTER(ctypes.c_int64),  # shift
                ctypes.POINTER(ctypes.c_double),  # dist
            ]
            lib.m3g_threebody.restype = ctypes.c_int64
            lib.m3g_threebody.argtypes = [
                ctypes.POINTER(ctypes.c_int64),  # edge_src
                ctypes.POINTER(ctypes.c_double),  # dist
                ctypes.c_int64,  # num_nodes
                ctypes.c_int64,  # num_edges
                ctypes.c_double,  # cutoff
                ctypes.c_int64,  # cap
                ctypes.POINTER(ctypes.c_int64),  # e1
                ctypes.POINTER(ctypes.c_int64),  # e2
                ctypes.POINTER(ctypes.c_int64),  # per_node
                ctypes.POINTER(ctypes.c_int64),  # per_edge
            ]
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
        return _LIB


def native_available() -> bool:
    return _load() is not None


def neighbor_list_native(
    lattice: np.ndarray, cart_coords: np.ndarray, cutoff: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell-list neighbor search; same contract as ``neighbor_list_pbc``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native neighbor library unavailable")
    lattice = np.ascontiguousarray(lattice, dtype=np.float64)
    pos = np.ascontiguousarray(cart_coords, dtype=np.float64).reshape(-1, 3)
    n = pos.shape[0]
    if n == 0:
        return (
            np.zeros((2, 0), dtype=np.int64),
            np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float64),
        )

    # Capacity guess: homogeneous density estimate + slack, then retry on
    # overflow (the function reports the required size).
    vol = abs(np.linalg.det(lattice))
    density = n / max(vol, 1e-12)
    cap = int(n * max(density * 4.19 * cutoff**3 * 1.5, 16.0)) + 64
    for _ in range(3):
        src = np.empty(cap, dtype=np.int64)
        dst = np.empty(cap, dtype=np.int64)
        shift = np.empty((cap, 3), dtype=np.int64)
        dist = np.empty(cap, dtype=np.float64)
        got = lib.m3g_neighbor_list(
            lattice.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            float(cutoff),
            cap,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            shift.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if got >= 0:
            return (
                np.stack([src[:got], dst[:got]]),
                shift[:got],
                dist[:got],
            )
        cap = -got + 64
    raise RuntimeError("neighbor list capacity negotiation failed")


def threebody_native(
    num_nodes: int,
    edge_index: np.ndarray,
    distances: np.ndarray,
    threebody_cutoff: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Triplet enumeration; same contract as data.triplets.compute_threebody."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(np.asarray(edge_index)[0], dtype=np.int64)
    dist = np.ascontiguousarray(distances, dtype=np.float64)
    num_edges = src.shape[0]

    # Exact-size first pass: T = sum d*(d-1) with d from a numpy bincount —
    # cheap at E scale, avoids capacity negotiation entirely.
    deg = np.bincount(src[dist <= threebody_cutoff], minlength=num_nodes)
    cap = int((deg * (deg - 1)).sum())

    e1 = np.empty(cap, dtype=np.int64)
    e2 = np.empty(cap, dtype=np.int64)
    per_node = np.empty(num_nodes, dtype=np.int64)
    per_edge = np.empty(num_edges, dtype=np.int64)
    got = lib.m3g_threebody(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        num_nodes,
        num_edges,
        float(threebody_cutoff),
        cap,
        e1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        per_node.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        per_edge.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if got != cap:
        raise RuntimeError(f"threebody_native size mismatch: {got} != {cap}")
    return np.stack([e1, e2]), per_node, per_edge
