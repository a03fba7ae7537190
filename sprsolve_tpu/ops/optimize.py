"""Operator optimization: pick the best execution layout for a matrix.

The analog of MKL's inspector-executor flow (``mkl_sparse_set_mv_hint`` +
``mkl_sparse_optimize``, ``src/mkl_mat.rs:81-148``): analyze the pattern once
at construction, then every SpMV runs in the chosen layout.

Decision procedure (native hostkit analysis, O(nnz)):

1. few distinct diagonals → DIA; and if the bandwidth also fits the Pallas
   kernel's halo budget → :class:`PaddedDIA` (VMEM-staged kernel).
2. otherwise → ELL (regular gather layout).

Complex matrices use the re/im-plane kernel wrapper.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..native import csr_count_diagonals
from ..sparse.containers import CSR, DIA, ELL
from .pallas_spmv import ComplexPaddedDIA, PaddedDIA


def optimize(
    m: CSR,
    *,
    max_diags: int = 32,
    prefer_pallas: bool = True,
):
    """Analyze ``m`` and return the fastest operator for repeated SpMV.

    Returns one of DIA / PaddedDIA / ComplexPaddedDIA / ELL. The returned
    operator satisfies the LinearOperator protocol; PaddedDIA variants work in
    their own 2-D vector layout (use ``.pad_vec``/``.unpad_vec``), the others
    on flat vectors.
    """
    n = m.shape[0]
    indptr = np.asarray(m.indptr, np.int64)
    indices = np.asarray(m.indices, np.int32)
    n_diags = csr_count_diagonals(n, indptr, indices)
    if n_diags <= max_diags:
        # Mosaic's lane rotate has no f64 lowering (tpu.dynamic_rotate), so
        # the Pallas kernel serves f32/c64; x64 fidelity runs use the XLA
        # DIA path (or CPU interpret mode).
        if prefer_pallas and m.data.dtype == jnp.complex64:
            # host-side build: complex data never placed on the device
            return ComplexPaddedDIA.from_csr(m)
        dia = DIA.from_csr(m, max_diags=max_diags)
        if prefer_pallas and m.data.dtype == jnp.float32:
            return PaddedDIA.from_dia(dia)
        return dia
    return ELL.from_csr(m)
