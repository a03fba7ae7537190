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
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        # a stale or cross-arch binary (e.g. copied checkout) must degrade to
        # the NumPy fallbacks, not crash the import of every solve path
        print(
            f"sprsolve_tpu.native: load failed ({e}); using python fallbacks",
            file=sys.stderr,
        )
        return None
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
    for name in ("ilu0_f32", "ilu0_f64", "ilu0_c64", "ilu0_c128",
                 "ic0_f32", "ic0_f64", "ic0_c64", "ic0_c128"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_int64, i64p, i32p, ctypes.c_void_p]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.mm_parse_coord.restype = ctypes.c_int64
    lib.mm_parse_coord.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        i64p, i64p, f64p, f64p,
    ]
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
    # pure-NumPy fallback: dedupe the union of (r,c) and (c,r) pairs
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    keys = np.unique(
        np.concatenate([rows * n + cols, cols * n + rows])
    )
    out_rows = keys // n
    out_indices = (keys % n).astype(np.int32)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(out_indptr, out_rows + 1, 1)
    np.cumsum(out_indptr, out=out_indptr)
    return out_indptr, out_indices


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
    # pure-NumPy BFS Cuthill-McKee (degree-ascending tie-break), reversed.
    # Matches the native hostkit semantics; O(n + nnz) with python-level BFS
    # over frontier layers (vectorized within each layer).
    deg = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int32)
    pos = 0
    by_deg = np.argsort(deg, kind="stable")
    for seed in by_deg:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        frontier = np.array([seed], dtype=np.int64)
        pos += 1
        while len(frontier):
            nxt = []
            for u in frontier:
                nbr = indices[indptr[u] : indptr[u + 1]]
                nbr = nbr[~visited[nbr]]
                if len(nbr):
                    nbr = nbr[np.argsort(deg[nbr], kind="stable")]
                    visited[nbr] = True
                    order[pos : pos + len(nbr)] = nbr
                    pos += len(nbr)
                    nxt.append(nbr)
            frontier = np.concatenate(nxt) if nxt else np.empty(0, np.int64)
    return order[::-1].copy()


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


_FACTOR_SUFFIX = {
    np.dtype(np.float32): "f32",
    np.dtype(np.float64): "f64",
    np.dtype(np.complex64): "c64",
    np.dtype(np.complex128): "c128",
}


def _factor(kind: str, n: int, indptr, indices, values) -> np.ndarray:
    """Shared driver for ilu0/ic0: returns the factored values array.

    Raises ``ZeroDivisionError`` with the 0-based pivot row on a zero
    (ilu0) / non-positive (ic0) pivot — converted to the package's typed
    ``ZeroDiagonalError`` by the precond layer.
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    values = np.array(values, copy=True)
    if values.dtype not in _FACTOR_SUFFIX:
        raise TypeError(f"{kind}: unsupported dtype {values.dtype}")
    lib = _load()
    if lib is not None:
        fn = getattr(lib, f"{kind}_{_FACTOR_SUFFIX[values.dtype]}")
        rc = fn(n, indptr, indices, values.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise ZeroDivisionError(int(rc) - 1)
        return values
    # pure-Python fallback (row-loop; fine at test scale)
    diag = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        row = indices[indptr[i]: indptr[i + 1]]
        hit = np.nonzero(row == i)[0]
        if len(hit) == 0:
            raise ZeroDivisionError(i)
        diag[i] = indptr[i] + hit[0]
    if kind == "ilu0":
        for i in range(n):
            pos = {int(c): int(p) for p, c in
                   zip(range(indptr[i], indptr[i + 1]), indices[indptr[i]: indptr[i + 1]])}
            for p in range(indptr[i], indptr[i + 1]):
                k = int(indices[p])
                if k >= i:
                    break
                akk = values[diag[k]]
                if akk == 0:
                    raise ZeroDivisionError(k)
                aik = values[p] / akk
                values[p] = aik
                for q in range(diag[k] + 1, indptr[k + 1]):
                    pj = pos.get(int(indices[q]))
                    if pj is not None:
                        values[pj] -= aik * values[q]
            if values[diag[i]] == 0:
                raise ZeroDivisionError(i)
        return values
    # ic0
    for i in range(n):
        pos = {}
        for p in range(indptr[i], indptr[i + 1]):
            c = int(indices[p])
            if c > i:
                break
            pos[c] = p
        for p in range(indptr[i], indptr[i + 1]):
            k = int(indices[p])
            if k >= i:
                break
            s = values[p]
            for q in range(indptr[k], indptr[k + 1]):
                j = int(indices[q])
                if j >= k:
                    break
                pj = pos.get(j)
                if pj is not None:
                    s -= values[pj] * np.conj(values[q])
            values[p] = s / values[diag[k]]
        d = float(np.real(values[diag[i]]))
        for p in range(indptr[i], diag[i]):
            d -= float(np.real(values[p] * np.conj(values[p])))
        if not d > 0.0:
            raise ZeroDivisionError(i)
        values[diag[i]] = np.sqrt(d)
    return values


def ilu0(n: int, indptr, indices, values) -> np.ndarray:
    """ILU(0) factorization in the CSR pattern (column-sorted rows).

    Returns a new values array holding L (strict lower, unit diagonal
    implied) and U (upper incl. diagonal) merged in the original pattern.
    """
    return _factor("ilu0", n, indptr, indices, values)


def ic0(n: int, indptr, indices, values) -> np.ndarray:
    """IC(0): incomplete Cholesky A ≈ L·Lᴴ in the lower-triangle pattern.

    Returns a new values array with L written over the lower-triangle
    positions (upper positions left untouched and must be ignored).
    """
    return _factor("ic0", n, indptr, indices, values)


def mm_parse_coord(text: bytes, nnz: int, field: int):
    """Native Matrix Market coordinate parser (see hostkit.cpp).

    ``field``: 0 pattern, 1 real/integer, 2 complex.  Returns
    ``(rows, cols, re, im)`` int64/float64 arrays, or ``None`` when the
    native library is unavailable (callers fall back to NumPy parsing).
    Raises ValueError on a malformed file.
    """
    lib = _load()
    if lib is None:
        return None
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    re = np.empty(nnz if field >= 1 else 0, dtype=np.float64)
    im = np.empty(nnz if field == 2 else 0, dtype=np.float64)
    got = lib.mm_parse_coord(
        text, len(text), nnz, field, rows, cols,
        re if field >= 1 else np.empty(0, np.float64),
        im if field == 2 else np.empty(0, np.float64),
    )
    if got != nnz:
        raise ValueError(
            f"malformed Matrix Market data: expected {nnz} entries, "
            f"parsed {max(got, 0)}"
        )
    return rows, cols, re, im
