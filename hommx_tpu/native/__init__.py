"""Native (C++) host runtime — ctypes bindings with graceful fallback.

The compute path of hommx_tpu is JAX/XLA/Pallas; this package is the native
runtime around it (see hostruntime.cpp for the mapping to the reference's
DOLFINx/dolfinx_mpc C++ responsibilities).  The shared library is compiled
on demand with g++; if the toolchain is unavailable the Python/numpy
implementations are used transparently (``native.available`` reports which).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostruntime.cpp")
_LIB = os.path.join(_HERE, "libhostruntime.so")

_lib = None
available = False


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return True
        # compile to a per-process temp path and rename atomically: a
        # concurrent import (pytest-xdist, multi-process launch) must never
        # CDLL a partially written .so, and a killed build must not leave a
        # truncated file that the mtime check would accept as up to date
        tmp = f"{_LIB}.build.{os.getpid()}"
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", tmp,
        ]
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            logger.warning("native build failed: %s", res.stderr.decode()[:500])
            try:
                os.remove(tmp)
            except OSError:
                pass
            return False
        os.replace(tmp, _LIB)
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        logger.warning("native build unavailable: %s", e)
        return False


def _load():
    global _lib, available
    if _lib is not None or available:
        return
    if os.environ.get("HOMMX_TPU_NO_NATIVE") == "1":
        return
    if not _build():
        return
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:  # pragma: no cover
        logger.warning("native load failed: %s", e)
        return

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.hr_ell_width.restype = ctypes.c_int64
    lib.hr_ell_width.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int64, i32p]
    lib.hr_ell_fill.restype = ctypes.c_int32
    lib.hr_ell_fill.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
    lib.hr_periodic_match.restype = ctypes.c_int64
    lib.hr_periodic_match.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32,
                                      ctypes.c_double, ctypes.c_double, i64p, i8p]
    lib.hr_locate_cells.restype = ctypes.c_int32
    lib.hr_locate_cells.argtypes = [f64p, ctypes.c_int64, i32p, ctypes.c_int64,
                                    ctypes.c_int32, f64p, ctypes.c_int64, i32p]
    lib.hr_greedy_aggregate.restype = ctypes.c_int64
    lib.hr_greedy_aggregate.argtypes = [i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, i64p]
    _lib = lib
    available = True


_load()


def build_ell_pattern_native(cell_dofs: np.ndarray, num_dofs: int):
    """Native ELL pattern build; returns (cols, slots, diag, K) or None."""
    if not available:
        return None
    cells = np.ascontiguousarray(cell_dofs, dtype=np.int32)
    nc, nb = cells.shape
    counts = np.zeros(num_dofs, dtype=np.int32)
    K = _lib.hr_ell_width(cells, nc, nb, num_dofs, counts)
    if K <= 0:
        return None
    cols = np.zeros((num_dofs, int(K)), dtype=np.int32)
    slots = np.zeros((nc, nb, nb), dtype=np.int32)
    diag = np.zeros(num_dofs, dtype=np.int32)
    rc = _lib.hr_ell_fill(cells, nc, nb, num_dofs, int(K), cols, slots, diag)
    if rc != 0:
        return None
    return cols, slots, diag, int(K)


def periodic_match_native(vertices: np.ndarray, rtol=1e-5, atol=1e-8):
    """Native slave→master matching; returns (masters, is_slave) or None.
    Raises ValueError on unmatched slaves (mirrors the Python path)."""
    if not available:
        return None
    verts = np.ascontiguousarray(vertices, dtype=np.float64)
    nv, dim = verts.shape
    masters = np.zeros(nv, dtype=np.int64)
    is_slave = np.zeros(nv, dtype=np.int8)
    unmatched = _lib.hr_periodic_match(verts, nv, dim, rtol, atol, masters, is_slave)
    if unmatched != 0:
        raise ValueError(
            f"periodic master not found for {unmatched} vertices; "
            "micro mesh faces do not match periodically"
        )
    return masters, is_slave.astype(bool)


def greedy_aggregate_native(rows_sorted, cols_sorted, n_nodes: int):
    """Native greedy AMG aggregation (ops/amg.py setup hot path); returns
    (agg, n_aggregates) or None.  Input COO adjacency must be row-sorted —
    same contract and identical output as the Python fallback."""
    if not available:
        return None
    rows = np.ascontiguousarray(rows_sorted, dtype=np.int64)
    cols = np.ascontiguousarray(cols_sorted, dtype=np.int64)
    agg = np.zeros(n_nodes, dtype=np.int64)
    na = _lib.hr_greedy_aggregate(rows, cols, rows.shape[0], n_nodes, agg)
    if na < 0:
        return None
    return agg, int(na)


def locate_cells_native(vertices, cells, points):
    """Native binned point→cell location; returns cell indices or None."""
    if not available:
        return None
    verts = np.ascontiguousarray(vertices, dtype=np.float64)
    cls = np.ascontiguousarray(cells, dtype=np.int32)
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(pts.shape[0], dtype=np.int32)
    rc = _lib.hr_locate_cells(
        verts, verts.shape[0], cls, cls.shape[0], verts.shape[1],
        pts, pts.shape[0], out,
    )
    return out if rc == 0 else None
