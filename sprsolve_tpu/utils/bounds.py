"""Host-side spectral interval estimates (Gershgorin).

One cheap O(nnz) NumPy pass over a host container gives an interval
[lo, hi] guaranteed to contain every eigenvalue — what the Chebyshev-basis
s-step solvers (``solvers.ca_cg``) and the eigensolver padding
(``parallel.eigen``) need.  For TIGHT estimates at the cost of ~30 matvecs
use :func:`sprsolve_tpu.precond.estimate_spectral_bounds` (Lanczos).  Loose bounds only widen the basis interval /
pad placement; they never break correctness.
"""

from __future__ import annotations

import numpy as np


def gershgorin_bounds(A) -> tuple:
    """Gershgorin (lower, upper) eigenvalue bounds of a host CSR/DIA
    container.  For Hermitian A these bracket the real spectrum."""
    from ..sparse.containers import DIA

    if isinstance(A, DIA):
        bands = np.asarray(A.bands)
        diag = bands[A.offsets.index(0)] if 0 in A.offsets else np.zeros(
            A.shape[0], bands.dtype
        )
        radius = np.zeros(A.shape[0], dtype=np.float64)
        for d, off in enumerate(A.offsets):
            if off == 0:
                continue
            # band d stores a_{i, i+off} at row index i (DIA convention of
            # sparse/containers.py): rows 0..n-|off| carry real entries
            radius += np.abs(bands[d])
        lo = float(np.min(diag.real - radius))
        hi = float(np.max(diag.real + radius))
        return lo, hi
    data = np.asarray(A.data)
    indices = np.asarray(A.indices)
    indptr = np.asarray(A.indptr)
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(indptr))
    off = rows != indices
    radius = np.bincount(rows[off], weights=np.abs(data[off]), minlength=n)
    diag = np.zeros(n, dtype=np.float64)
    dmask = ~off
    diag[rows[dmask]] = data[dmask].real
    return float(np.min(diag - radius)), float(np.max(diag + radius))
