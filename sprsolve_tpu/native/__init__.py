"""ctypes bindings for the native host toolkit (hostkit.cpp).

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-NumPy/Python fallback so the package works without a toolchain.
``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "hostkit.cpp")
_SO = os.path.join(_HERE, "_hostkit.so")

_lib = None


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        cmd = [
            "g++",
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            "-march=native",
            _SRC,
            "-o",
            _SO + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception as e:  # toolchain missing / sandboxed build dir
        print(f"sprsolve_tpu.native: build failed ({e}); using python fallbacks",
              file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.greedy_color.restype = ctypes.c_int32
    lib.greedy_color.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    lib.symmetrize_pattern.restype = ctypes.c_int64
    lib.symmetrize_pattern.argtypes = [
        ctypes.c_int64, i64p, i32p, i64p, ctypes.c_void_p,
    ]
    lib.rcm_order.restype = None
    lib.rcm_order.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    lib.coo_sort_perm.restype = None
    lib.coo_sort_perm.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i64p]
    lib.csr_bandwidth.restype = ctypes.c_int64
    lib.csr_bandwidth.argtypes = [ctypes.c_int64, i64p, i32p]
    lib.csr_count_diagonals.restype = ctypes.c_int64
    lib.csr_count_diagonals.argtypes = [ctypes.c_int64, i64p, i32p]
    _lib = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def symmetrize_pattern(n: int, indptr: np.ndarray, indices: np.ndarray):
    """Pattern of A ∪ Aᵀ as (indptr, indices)."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if lib is not None:
        out_indptr = np.zeros(n + 1, dtype=np.int64)
        total = lib.symmetrize_pattern(n, indptr, indices, out_indptr, None)
        out_indices = np.zeros(total, dtype=np.int32)
        lib.symmetrize_pattern(
            n, indptr, indices, out_indptr,
            out_indices.ctypes.data_as(ctypes.c_void_p),
        )
        return out_indptr, out_indices
    import scipy.sparse as sps

    a = sps.csr_matrix(
        (np.ones(len(indices), np.int8), indices, indptr), shape=(n, n)
    )
    s = (a + a.T).tocsr()
    return s.indptr.astype(np.int64), s.indices.astype(np.int32)


def greedy_color(n: int, indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """First-fit coloring of a symmetric CSR adjacency."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    colors = np.zeros(n, dtype=np.int32)
    if lib is not None:
        lib.greedy_color(n, indptr, indices, colors)
        return colors
    colors[:] = -1
    for i in range(n):
        nbr = indices[indptr[i] : indptr[i + 1]]
        used = set(colors[nbr[nbr != i]].tolist())
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def rcm_order(n: int, indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee ordering (input pattern must be symmetric)."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if lib is not None:
        order = np.zeros(n, dtype=np.int32)
        lib.rcm_order(n, indptr, indices, order)
        return order
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = sps.csr_matrix(
        (np.ones(len(indices), np.int8), indices, indptr), shape=(n, n)
    )
    return reverse_cuthill_mckee(a, symmetric_mode=True).astype(np.int32)


def coo_sort_perm(n_rows: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Lexicographic (row, col) sort permutation."""
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    if lib is not None:
        perm = np.zeros(len(rows), dtype=np.int64)
        lib.coo_sort_perm(n_rows, len(rows), rows, cols, perm)
        return perm
    return np.lexsort((cols, rows))


def csr_bandwidth(n: int, indptr: np.ndarray, indices: np.ndarray) -> int:
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if lib is not None:
        return int(lib.csr_bandwidth(n, indptr, indices))
    rows = np.repeat(np.arange(n), np.diff(indptr))
    return int(np.abs(indices.astype(np.int64) - rows).max()) if len(indices) else 0


def csr_count_diagonals(n: int, indptr: np.ndarray, indices: np.ndarray) -> int:
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if lib is not None:
        return int(lib.csr_count_diagonals(n, indptr, indices))
    rows = np.repeat(np.arange(n), np.diff(indptr))
    return len(np.unique(indices.astype(np.int64) - rows))
