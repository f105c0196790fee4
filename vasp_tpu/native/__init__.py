"""ctypes bindings for the native meshcore library, with numpy fallbacks.

Builds on first use if g++ is available (``make -C vasp_tpu/native``); every
entry point transparently falls back to the pure-numpy implementation when
the shared library cannot be built or the problem exceeds its index range.
"""
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB = None
_TRIED = False

# exact-key facet hashing is valid while nv^3 fits in uint64
_MAX_NV = 2_600_000


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libmeshcore.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.build_edges.restype = ctypes.c_int64
    lib.build_edges.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                i64p, i64p]
    lib.build_facets.restype = ctypes.c_int64
    lib.build_facets.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                 i64p, i64p]
    lib.rcm_order.restype = None
    lib.rcm_order.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
    lib.expand_overlap.restype = None
    lib.expand_overlap.argtypes = [i64p, i64p, ctypes.c_int64,
                                   ctypes.c_int, u8p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_edges(cells, num_vertices):
    """(edges (Ne,2) int64, cell_edges (Nc,6) int64) or None on fallback."""
    lib = _load()
    if lib is None or num_vertices > _MAX_NV:
        return None
    cells = np.ascontiguousarray(cells, np.int64)
    nc = cells.shape[0]
    edges = np.empty((6 * nc, 2), np.int64)
    cell_edges = np.empty((nc, 6), np.int64)
    ne = lib.build_edges(cells, nc, int(num_vertices), edges, cell_edges)
    return edges[:ne].copy(), cell_edges


def build_facets(cells, num_vertices):
    """(facets (F,3) sorted, adj (F,4): cell0,lf0,cell1,lf1) or None."""
    lib = _load()
    if lib is None or num_vertices > _MAX_NV:
        return None
    cells = np.ascontiguousarray(cells, np.int64)
    nc = cells.shape[0]
    facets = np.empty((4 * nc, 3), np.int64)
    adj = np.empty((4 * nc, 4), np.int64)
    nf = lib.build_facets(cells, nc, int(num_vertices), facets, adj)
    return facets[:nf].copy(), adj[:nf].copy()


def rcm_order(indptr, indices, n):
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    perm = np.empty(n, np.int64)
    lib.rcm_order(indptr, indices, int(n), perm)
    return perm


def expand_overlap(indptr, indices, flags, layers):
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    flags = np.ascontiguousarray(flags, np.uint8).copy()
    lib.expand_overlap(indptr, indices, len(flags), int(layers), flags)
    return flags.astype(bool)
