"""Shift-invert interior eigensolver (beyond the reference, which has no
eigensolver surface): dense-eigh oracle checks on nearest-σ selection,
one-sided modes, the padded-kernel layout path, the InvertedOperator
building block, and error paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.errors import IncompatibleMatrixFormat, Status
from sprsolve_tpu.solvers import InvertedOperator, shift_invert_eigs
from sprsolve_tpu.utils import problems


def _tridiag(n=64):
    dense = (
        np.diag(np.full(n, 2.0))
        + np.diag(np.full(n - 1, -1.0), 1)
        + np.diag(np.full(n - 1, -1.0), -1)
    )
    return dense, sp.csr_from_dense(dense)


def test_interior_eigs_match_dense_oracle():
    dense, A = _tridiag()
    ev = np.linalg.eigvalsh(dense)
    sigma = 1.0
    want = np.sort(ev[np.argsort(np.abs(ev - sigma))[:4]])
    lam, X, info = shift_invert_eigs(A, 4, sigma, tol=1e-8, max_iter=200)
    assert int(info.status) == Status.CONVERGED
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-7)
    # true eigenpairs on A itself
    Xn = np.asarray(X)
    for i in range(4):
        r = dense @ Xn[:, i] - np.asarray(lam)[i] * Xn[:, i]
        assert np.linalg.norm(r) < 1e-6
    # returned nearest-first
    d = np.abs(np.asarray(lam) - sigma)
    assert np.all(np.diff(d) >= -1e-12)


def test_one_sided_modes():
    dense, A = _tridiag()
    ev = np.linalg.eigvalsh(dense)
    sigma = 1.0
    lam_a, _, info_a = shift_invert_eigs(
        A, 3, sigma, side="above", tol=1e-8, max_iter=200
    )
    assert int(info_a.status) == Status.CONVERGED
    assert np.all(np.asarray(lam_a) >= sigma)
    want_a = np.sort(ev[ev >= sigma])[:3]
    np.testing.assert_allclose(np.sort(np.asarray(lam_a)), want_a, atol=1e-7)
    lam_b, _, info_b = shift_invert_eigs(
        A, 3, sigma, side="below", tol=1e-8, max_iter=200
    )
    assert int(info_b.status) == Status.CONVERGED
    assert np.all(np.asarray(lam_b) < sigma)
    want_b = np.sort(ev[ev < sigma])[-3:]
    np.testing.assert_allclose(np.sort(np.asarray(lam_b)), want_b, atol=1e-7)


def test_degenerate_interior_cluster_2d():
    """2-D Laplacian spectra carry multiplicity-2 clusters; the k nearest
    must still come out right (as a set, within tolerance)."""
    A, _ = problems.sym_grid_laplacian((10, 10))
    A = sp.csr_from_dense(-np.asarray(A.todense()))  # make it PD
    dense = np.asarray(A.todense())
    ev = np.linalg.eigvalsh(dense)
    sigma = 2.0
    want = np.sort(ev[np.argsort(np.abs(ev - sigma))[:4]])
    lam, X, info = shift_invert_eigs(
        A, 4, sigma, tol=1e-7, max_iter=300, inner_max_iter=600
    )
    assert int(info.status) == Status.CONVERGED
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-5)


def test_padded_kernel_layout_path():
    """A banded matrix routed by optimize() to the padded Pallas layout:
    the driver flattens per apply and the answer matches the flat path."""
    A3 = problems.poisson3d(6, 6, 6, dtype=np.float64)
    dense = np.asarray(A3.todense())
    ev = np.linalg.eigvalsh(dense)
    sigma = float(np.median(ev))
    # the two nearest-σ slots are a 6+6-fold degenerate TIE at equal
    # distance, so assert distances and genuine-eigenpair residuals (any
    # valid tie-pick passes), plus mutual orthogonality (dedup sanity)
    want_d = np.sort(np.abs(ev - sigma))[:2]
    lam, X, info = shift_invert_eigs(
        A3, 2, sigma, tol=1e-6, max_iter=300, inner_max_iter=800
    )
    assert int(info.status) == Status.CONVERGED
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(lam) - sigma)), want_d, atol=1e-4
    )
    Xn = np.asarray(X)
    for i in range(2):
        r = dense @ Xn[:, i] - np.asarray(lam)[i] * Xn[:, i]
        assert np.linalg.norm(r) / np.linalg.norm(Xn[:, i]) < 1e-4
    assert abs(np.vdot(Xn[:, 0], Xn[:, 1])) < 0.1


def test_inverted_operator_applies_the_inverse():
    dense, A = _tridiag(32)
    sigma = 0.7
    from sprsolve_tpu.ops.operator import ShiftedOperator

    sh = ShiftedOperator(A=A, shift=jnp.asarray(sigma, jnp.float64))
    inv = InvertedOperator(A=sh, inner_tol=1e-12, inner_max_iter=400)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(32))
    y = inv.matvec(x)
    np.testing.assert_allclose(
        np.asarray(y),
        np.linalg.solve(dense - sigma * np.eye(32), np.asarray(x)),
        atol=1e-9,
    )
    # matmat = vmapped inner solves
    X = jnp.asarray(np.random.default_rng(1).standard_normal((32, 3)))
    Y = inv.matmat(X)
    np.testing.assert_allclose(
        np.asarray(Y),
        np.linalg.solve(dense - sigma * np.eye(32), np.asarray(X)),
        atol=1e-9,
    )


def test_scipy_compat_eigsh_matches_arpack():
    """scipy_compat.eigsh vs scipy's ARPACK on both modes (shift-invert
    nearest-σ and smallest-algebraic)."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    from sprsolve_tpu import scipy_compat

    n = 64
    S = sps.diags(
        [np.full(n, 2.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0)],
        [0, 1, -1], format="csr",
    )
    w, v = scipy_compat.eigsh(S, k=4, sigma=1.0, tol=1e-8)
    w_sc = spla.eigsh(S.tocsc(), k=4, sigma=1.0, return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(w), np.sort(w_sc), atol=1e-6)
    assert np.all(np.diff(w) > 0)  # ascending, scipy-style
    w2 = scipy_compat.eigsh(
        S, k=3, which="SA", maxiter=300, tol=1e-7, return_eigenvectors=False
    )
    w2_sc = spla.eigsh(S, k=3, which="SA", return_eigenvectors=False)
    np.testing.assert_allclose(np.sort(w2), np.sort(w2_sc), atol=1e-5)
    with pytest.raises(NotImplementedError):
        scipy_compat.eigsh(S, k=2, which="LM")  # no sigma: LM unsupported
    with pytest.raises(NotImplementedError):
        scipy_compat.eigsh(S, k=2, sigma=1.0, which="SA")


def test_error_paths():
    _, A = _tridiag(32)
    with pytest.raises(IncompatibleMatrixFormat):
        shift_invert_eigs(A, 0, 1.0)
    with pytest.raises(IncompatibleMatrixFormat):
        shift_invert_eigs(A, 2, 1.0, side="sideways")
    with pytest.raises(IncompatibleMatrixFormat):
        shift_invert_eigs(A, 2, 1.0, X0=jnp.zeros((5, 5)))
