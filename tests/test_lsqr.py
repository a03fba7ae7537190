"""LSQR (least squares / rectangular) and the operator-adjoint surface.

Ground truth throughout is NumPy dense linear algebra: ``np.linalg.solve``
for consistent square systems, ``np.linalg.lstsq`` for overdetermined,
pinv for min-norm underdetermined, and the damped normal equations for
``damp > 0``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems


def _random_sparse(m, n, density=0.15, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    if complex_:
        dense = dense + 1j * rng.standard_normal((m, n)) * (
            rng.random((m, n)) < density
        )
    # keep it well-conditioned-ish
    k = min(m, n)
    dense[np.arange(k), np.arange(k)] += 3.0
    return sp.csr_from_dense(dense), dense


def test_transpose_and_adjoint_dense_oracle():
    A, dense = _random_sparse(13, 7, seed=1, complex_=True)
    np.testing.assert_allclose(
        np.asarray(A.transpose().todense()), dense.T, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(A.adjoint().todense()), dense.conj().T, atol=1e-14
    )
    # adjoint matvec == dense Aᴴ·y
    y = np.random.default_rng(2).standard_normal(13)
    np.testing.assert_allclose(
        np.asarray(A.adjoint().matvec(jnp.asarray(y))),
        dense.conj().T @ y,
        atol=1e-12,
    )


def test_consistent_square_system():
    A, dense = _random_sparse(40, 40, seed=3)
    x_true = np.random.default_rng(4).standard_normal(40)
    b = dense @ x_true
    x, info = sp.lsqr(A, jnp.asarray(b), tol=1e-12, max_iter=400)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-8)
    assert float(info.residual) < 1e-10


def test_overdetermined_matches_lstsq():
    A, dense = _random_sparse(60, 20, seed=5)
    b = np.random.default_rng(6).standard_normal(60)
    x, info = sp.lsqr(A, jnp.asarray(b), tol=1e-12, max_iter=400)
    info.raise_if_error()
    want = np.linalg.lstsq(dense, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-7)
    # normal equations hold: Aᴴ(b − Ax) ≈ 0
    r = b - dense @ np.asarray(x)
    assert np.linalg.norm(dense.T @ r) < 1e-7 * np.linalg.norm(dense.T @ b)


def test_underdetermined_min_norm():
    A, dense = _random_sparse(15, 40, seed=7)
    x_true = np.random.default_rng(8).standard_normal(40)
    b = dense @ x_true  # consistent
    x, info = sp.lsqr(A, jnp.asarray(b), tol=1e-12, max_iter=600)
    info.raise_if_error()
    want = np.linalg.pinv(dense) @ b  # min-norm solution
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-7)


def test_damped_matches_normal_equations():
    A, dense = _random_sparse(50, 20, seed=9)
    b = np.random.default_rng(10).standard_normal(50)
    damp = 0.7
    x, info = sp.lsqr(A, jnp.asarray(b), damp=damp, tol=1e-13, max_iter=600)
    info.raise_if_error()
    want = np.linalg.solve(
        dense.T @ dense + damp**2 * np.eye(20), dense.T @ b
    )
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-8)


def test_complex_overdetermined():
    A, dense = _random_sparse(30, 12, seed=11, complex_=True)
    rng = np.random.default_rng(12)
    b = rng.standard_normal(30) + 1j * rng.standard_normal(30)
    x, info = sp.lsqr(A, jnp.asarray(b), tol=1e-12, max_iter=400)
    info.raise_if_error()
    want = np.linalg.lstsq(dense, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-7)


def test_under_jit_with_explicit_adjoint():
    A, dense = _random_sparse(25, 25, seed=13)
    AH = A.adjoint()
    b = jnp.asarray(np.random.default_rng(14).standard_normal(25))

    @jax.jit
    def run(a, ah, b_):
        return sp.lsqr(a, b_, AH=ah, tol=1e-12, max_iter=400)

    x, info = run(A, AH, b)
    info.raise_if_error()
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, np.asarray(b)), atol=1e-8
    )


def test_warm_start_and_zero_rhs():
    A, dense = _random_sparse(30, 30, seed=15)
    x_true = np.random.default_rng(16).standard_normal(30)
    b = jnp.asarray(dense @ x_true)
    x0 = jnp.asarray(x_true + 1e-10 * np.ones(30))
    _, info = sp.lsqr(A, b, x0, tol=1e-8, max_iter=200)
    info.raise_if_error()
    assert int(info.iterations) <= 2  # warm start nearly converged
    x_z, info_z = sp.lsqr(A, jnp.zeros(30), tol=1e-8, max_iter=200)
    assert int(info_z.iterations) == 0
    assert np.all(np.asarray(x_z) == 0)


def test_solve_api_and_prepare():
    A, dense = _random_sparse(40, 16, seed=17)
    b = np.random.default_rng(18).standard_normal(40)
    x, info = sp.solve(A, b, method="lsqr", tol=1e-12, max_iter=400)
    info.raise_if_error()
    want = np.linalg.lstsq(dense, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-7)
    with pytest.raises(sp.errors.InvalidPreconditioner):
        sp.solve(A, b, method="lsqr", M="jacobi", tol=1e-8, max_iter=10)
    handle = sp.prepare(A, method="lsqr", tol=1e-12, max_iter=400)
    x2, info2 = handle(b)
    info2.raise_if_error()
    np.testing.assert_allclose(np.asarray(x2), want, atol=1e-7)


def test_scipy_compat_lsqr():
    from sprsolve_tpu import scipy_compat

    A, dense = _random_sparse(35, 14, seed=19)
    b = np.random.default_rng(20).standard_normal(35)
    out = scipy_compat.lsqr(A, b, atol=1e-10, btol=1e-10)
    x, istop, itn, r1norm, r2norm = out[0], out[1], out[2], out[3], out[4]
    want = np.linalg.lstsq(dense, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
    assert istop == 2  # inconsistent system: least-squares convergence
    assert itn > 0
    r = b - dense @ np.asarray(x)
    assert abs(r1norm - np.linalg.norm(r)) < 1e-8
    assert r2norm >= r1norm - 1e-12
    # consistent system reports istop 1
    b_c = dense @ want
    out_c = scipy_compat.lsqr(A, b_c, atol=1e-10, btol=1e-10)
    assert out_c[1] == 1


def test_square_banded_poisson_consistency():
    # LSQR on a square SPD system agrees with CG (sanity across solvers)
    A, _ = problems.sym_grid_laplacian((12, 12))
    Acsr = sp.csr_from_dense(-np.asarray(A.todense()))
    b = jnp.asarray(np.random.default_rng(21).standard_normal(144))
    x_l, info_l = sp.lsqr(Acsr, b, tol=1e-12, max_iter=2000)
    info_l.raise_if_error()
    x_c, info_c = sp.cg(Acsr.to_dia(), b, tol=1e-12, max_iter=2000)
    info_c.raise_if_error()
    np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_c), atol=1e-6)
