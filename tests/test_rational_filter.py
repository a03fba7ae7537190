"""Rational-filter (FEAST-style) interior eigensolver.

The production interior-σ path (VERDICT r4 #2): complex-shifted COCG inner
solves instead of indefinite real MINRES.  Oracle: dense eigh of the same
operator; the contract mirrors shift_invert_eigs (measured A-residual
gates CONVERGED, |λ−σ| ordering, side filter).
"""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sps

import sprsolve_tpu as sp
from sprsolve_tpu.errors import IncompatibleMatrixFormat, Status
from sprsolve_tpu.utils import problems


def _spd_grid(side=24):
    A, _ = problems.sym_grid_laplacian((side, side))
    return dataclasses.replace(A, data=-A.data)


def _dense_eigs(A):
    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    return np.linalg.eigvalsh(S.toarray())


def test_interior_pairs_match_dense():
    A = _spd_grid(24)
    w = _dense_eigs(A)
    sigma = 2.0
    lam, X, info = sp.rational_filter_eigs(A, 4, sigma, tol=1e-8, seed=1)
    assert int(info.status) == Status.CONVERGED
    assert float(info.residual) <= 1e-8
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:4]])
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-9)
    # vectors: measured residual on A is the contract — verify directly
    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    Xn = np.asarray(X)
    R = S @ Xn - Xn * np.asarray(lam)[None, :]
    assert np.abs(R).max() < 1e-7


def test_explicit_radius_and_ordering():
    A = _spd_grid(16)
    w = _dense_eigs(A)
    sigma = 3.0
    gaps = np.sort(np.abs(w - sigma))
    # place the contour boundary in a REAL spectral gap (a contour through
    # a degenerate multiplet is the classic FEAST pathology: the filter
    # ratio across the boundary → 1 and subspace iteration stalls)
    i = next(
        j for j in range(3, len(gaps) - 1) if gaps[j + 1] - gaps[j] > 1e-3
    )
    radius = float(0.5 * (gaps[i] + gaps[i + 1]))
    lam, _, info = sp.rational_filter_eigs(
        A, 3, sigma, radius=radius, m0=max(8, i + 4), tol=1e-8, seed=0
    )
    assert int(info.status) == Status.CONVERGED
    # ordered by |λ − σ| ascending
    d = np.abs(np.asarray(lam) - sigma)
    assert np.all(np.diff(d) >= -1e-12)
    np.testing.assert_allclose(np.sort(d), gaps[:3], atol=1e-9)


@pytest.mark.parametrize("side_", ["above", "below"])
def test_side_filter(side_):
    A = _spd_grid(16)
    w = _dense_eigs(A)
    sigma = 3.0
    lam, _, info = sp.rational_filter_eigs(
        A, 2, sigma, side=side_, tol=1e-8, seed=0
    )
    assert int(info.status) == Status.CONVERGED
    lam = np.asarray(lam)
    if side_ == "above":
        assert np.all(lam >= sigma)
        want = np.sort(w[w >= sigma])[:2]
        np.testing.assert_allclose(np.sort(lam), want, atol=1e-9)
    else:
        assert np.all(lam < sigma)
        want = np.sort(w[w < sigma])[-2:]
        np.testing.assert_allclose(np.sort(lam), want, atol=1e-9)


def test_f32_path():
    A = _spd_grid(16)
    A32 = dataclasses.replace(A, data=np.asarray(A.data).astype(np.float32))
    w = _dense_eigs(A)
    sigma = 2.5
    lam, _, info = sp.rational_filter_eigs(
        A32, 2, sigma, tol=5e-4, inner_tol=1e-6, seed=2
    )
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:2]])
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=5e-3)


def test_empty_disc_reports_insufficient():
    A = _spd_grid(12)
    w = _dense_eigs(A)
    sigma = 3.0
    gap = np.abs(w - sigma).min()
    lam, _, info = sp.rational_filter_eigs(
        A, 2, sigma, radius=float(gap * 0.3), tol=1e-8, max_iter=2, seed=0
    )
    assert int(info.status) == Status.INSUFFICIENT_ITER


def test_rejects_complex_and_bad_args():
    A, _, _ = problems.complex_symmetric_grid_with_diag((8, 8))
    with pytest.raises(IncompatibleMatrixFormat):
        sp.rational_filter_eigs(A, 2, 1.0)
    As = _spd_grid(8)
    with pytest.raises(IncompatibleMatrixFormat):
        sp.rational_filter_eigs(As, 0, 1.0)
    with pytest.raises(IncompatibleMatrixFormat):
        sp.rational_filter_eigs(As, 2, 1.0, side="nope")
    with pytest.raises(IncompatibleMatrixFormat):
        sp.rational_filter_eigs(As, 4, 1.0, m0=2)


def test_shift_invert_fgmres_inner_with_any_M():
    """InvertedOperator(method='fgmres') lifts MINRES's SPD-M restriction:
    an inner-Krylov preconditioner (nonlinear map) on the shifted system
    still yields correct interior pairs."""
    from sprsolve_tpu.ops.operator import ShiftedOperator
    from sprsolve_tpu.precond import InnerSolvePrecond

    A = _spd_grid(12)
    w = _dense_eigs(A)
    sigma = 2.0
    shifted = ShiftedOperator(A=A.to_dia(), shift=np.float64(sigma))
    M_in = InnerSolvePrecond(A=shifted, method="minres", iters=8)
    lam, _, info = sp.shift_invert_eigs(
        A, 2, sigma, M_inner=M_in, inner_method="fgmres",
        inner_max_iter=200, tol=1e-6, max_iter=60,
    )
    assert int(info.status) == Status.CONVERGED
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:2]])
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-6)


def test_inverted_operator_unknown_method_raises():
    import jax.numpy as jnp

    from sprsolve_tpu.solvers import InvertedOperator

    A = _spd_grid(8).to_dia()
    inv = InvertedOperator(A=A, method="nope")
    with pytest.raises(IncompatibleMatrixFormat):
        inv.matvec(jnp.ones(64))
