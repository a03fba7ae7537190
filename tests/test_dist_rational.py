"""Distributed rational-filter eigensolver over the 8-device CPU mesh.

Same contracts as the single-chip driver (tests/test_rational_filter.py):
dense-eigh oracle, ghost-filtered selection, measured-A-residual gate —
plus mesh-specific properties: result invariance vs the single-chip
driver, pad-row handling for n not divisible by the mesh, and zero pad
leakage through the filter/QR chain.
"""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sps

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.parallel import distributed_rational_filter_eigs
from sprsolve_tpu.utils import problems


def _spd_grid(side):
    A, _ = problems.sym_grid_laplacian((side, side))
    return dataclasses.replace(A, data=-A.data)


def _dense_eigs(A):
    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    return S, np.linalg.eigvalsh(S.toarray())


def test_matches_dense_oracle_on_mesh():
    A = _spd_grid(24)
    S, w = _dense_eigs(A)
    sigma = 2.0
    lam, X, info = distributed_rational_filter_eigs(A, 4, sigma, tol=1e-8,
                                                    seed=1)
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:4]])
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-9)
    R = S @ np.asarray(X) - np.asarray(X) * np.asarray(lam)[None, :]
    assert np.abs(R).max() < 1e-7


def test_matches_single_chip_driver():
    A = _spd_grid(16)
    sigma = 3.0
    lam_d, _, info_d = distributed_rational_filter_eigs(
        A, 3, sigma, tol=1e-8, seed=0
    )
    lam_s, _, info_s = sp.rational_filter_eigs(A, 3, sigma, tol=1e-8, seed=0)
    assert int(info_d.status) == int(info_s.status) == Status.CONVERGED
    np.testing.assert_allclose(
        np.sort(np.asarray(lam_d)), np.sort(np.asarray(lam_s)), atol=1e-9
    )


def test_pad_rows_n_not_divisible():
    # 15*15 = 225 rows over 8 devices -> 7 pad rows; pads sit at
    # sigma + 2D, outside any disc, and must never surface as pairs
    A = _spd_grid(15)
    S, w = _dense_eigs(A)
    sigma = 2.5
    lam, X, info = distributed_rational_filter_eigs(A, 3, sigma, tol=1e-8,
                                                    seed=2)
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:3]])
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-9)
    assert np.asarray(X).shape == (225, 3)


def test_side_above():
    A = _spd_grid(16)
    S, w = _dense_eigs(A)
    sigma = 3.0
    lam, _, info = distributed_rational_filter_eigs(
        A, 2, sigma, side="above", tol=1e-8, seed=0
    )
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[w >= sigma])[:2]
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-9)


def test_rejects_complex():
    A, _, _ = problems.complex_symmetric_grid_with_diag((8, 8))
    from sprsolve_tpu.errors import IncompatibleMatrixFormat

    with pytest.raises((IncompatibleMatrixFormat, TypeError)):
        distributed_rational_filter_eigs(A, 2, 1.0)


def test_inner_refine_on_f32_operator_over_mesh():
    """Mixed-precision inner refinement over the mesh: an f32 operator +
    inner_refine reaches tolerances the pure-f32 path cannot at stressed
    conditioning (the same scheme as the single-chip driver — c64 COCG
    sweeps + partitioned-f64 straight-line corrections + f64 quadrature
    accumulation)."""
    A = _spd_grid(24)
    A32 = dataclasses.replace(
        A, data=np.asarray(A.data).astype(np.float32)
    )
    S, w = _dense_eigs(A)
    sigma = 2.0
    lam, X, info = distributed_rational_filter_eigs(
        A32, 3, sigma, tol=5e-5, inner_tol=1e-3, inner_max_iter=1500,
        inner_refine=2, seed=1,
    )
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:3]])
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), want, atol=5e-4
    )
