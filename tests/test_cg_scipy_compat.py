"""CG solver + scipy.sparse.linalg-compat layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu import scipy_compat
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems


def _spd(n_side=16, dtype=np.float64):
    A, _ = problems.sym_grid_laplacian((n_side, n_side))
    return sp.csr_from_dense(-np.asarray(A.todense()).astype(dtype))


# ------------------------------------------------------------------------- cg


def test_cg_solves_spd():
    A = _spd()
    b = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    x, info = sp.cg(A.to_dia(), b, tol=1e-12, max_iter=2000)
    info.raise_if_error()
    r = np.asarray(A.matvec(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10


def test_cg_precond_fewer_iters():
    A = _spd()
    b = jnp.asarray(np.random.default_rng(1).standard_normal(256))
    _, info_plain = sp.cg(A.to_dia(), b, tol=1e-10, max_iter=2000)
    M = sp.IC0Precond.from_csr(A, sweeps=3)
    x, info_ic = sp.cg(A.to_dia(), b, M=M, tol=1e-10, max_iter=2000)
    info_ic.raise_if_error()
    assert int(info_ic.iterations) < int(info_plain.iterations)
    r = np.asarray(A.matvec(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_cg_fewer_matvecs_than_minres_iters_comparable():
    # same SPD system: CG and MINRES converge in comparable iterations;
    # CG must not be wildly worse (sanity of the recurrence)
    A = _spd()
    b = jnp.asarray(np.random.default_rng(2).standard_normal(256))
    _, info_cg = sp.cg(A.to_dia(), b, tol=1e-10, max_iter=2000)
    _, info_mr = sp.minres(A.to_dia(), b, tol=1e-10, max_iter=2000)
    assert int(info_cg.iterations) <= int(info_mr.iterations) * 2


def test_cg_breakdown_on_indefinite():
    dense = np.diag(np.array([1.0, -1.0, 2.0, -2.0]))
    A = sp.csr_from_dense(dense)
    b = jnp.asarray(np.array([1.0, 1.0, 1.0, 1.0]))
    x, info = sp.cg(A, b, tol=1e-14, max_iter=50)
    assert int(info.status) in (int(Status.BREAKDOWN), int(Status.CONVERGED))
    # the indefinite diagonal must trip the positivity gate at some point
    assert int(info.status) == int(Status.BREAKDOWN)


def test_cg_warm_start_and_zero_rhs():
    A = _spd()
    b = jnp.zeros(256)
    x, info = sp.cg(A.to_dia(), b, tol=1e-10, max_iter=100)
    assert int(info.iterations) == 0 and float(jnp.abs(x).max()) == 0.0
    b2 = jnp.asarray(np.random.default_rng(3).standard_normal(256))
    x1, _ = sp.cg(A.to_dia(), b2, tol=1e-10, max_iter=2000)
    _, info_warm = sp.cg(A.to_dia(), b2, x0=x1, tol=1e-10, max_iter=2000)
    assert int(info_warm.iterations) <= 1


def test_cg_record_residuals_monotonic_tail():
    A = _spd()
    b = jnp.asarray(np.random.default_rng(4).standard_normal(256))
    x, info, hist = sp.cg(
        A.to_dia(), b, tol=1e-10, max_iter=500, record_residuals=True
    )
    h = np.asarray(hist)
    nit = int(info.iterations)
    assert np.isfinite(h[: nit + 1]).all()
    assert h[nit] < 1e-10 and np.isnan(h[nit + 1 :]).all()


def test_cg_under_user_jit_and_api_class():
    A = _spd()
    b = jnp.asarray(np.random.default_rng(5).standard_normal(256))
    run = jax.jit(lambda a, bb: sp.cg(a, bb, tol=1e-10, max_iter=1000))
    x, info = run(A.to_dia(), b)
    assert int(info.status) == int(Status.CONVERGED)
    x2, (iters, res) = sp.CG.new(A.to_dia(), 256).solve(b, tol=1e-10)
    assert res < 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2))


def test_cg_complex_hermitian():
    # Hermitian PD: shift the reference Hermitian grid to be PD
    A, _ = problems.hermitian_grid((8, 8))
    dense = np.asarray(A.todense())
    dense = -(dense + dense.conj().T) / 2 + 10.0 * np.eye(64)
    Ah = sp.csr_from_dense(dense.astype(np.complex128))
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.standard_normal(64) + 1j * rng.standard_normal(64))
    x, info = sp.cg(Ah, b, tol=1e-12, max_iter=500)
    info.raise_if_error()
    r = dense @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10


# ----------------------------------------------------------------- scipy compat


def test_compat_cg_with_scipy_matrix():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    A = _spd()
    S = scipy_sparse.csr_matrix(np.asarray(A.todense()))
    b = np.random.default_rng(0).standard_normal(256)
    x, info = scipy_compat.cg(S, b, rtol=1e-10)
    assert info == 0
    r = S @ np.asarray(x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_compat_info_positive_on_maxiter():
    A = _spd()
    b = np.random.default_rng(1).standard_normal(256)
    x, info = scipy_compat.cg(A, b, rtol=1e-12, maxiter=3)
    assert info > 0  # scipy convention: iteration count, no convergence


def test_compat_bicgstab_and_minres():
    A = _spd()
    b = np.random.default_rng(2).standard_normal(256)
    for fn in (scipy_compat.bicgstab, scipy_compat.minres):
        x, info = fn(A, b, rtol=1e-9)
        assert info == 0, fn.__name__
        r = np.asarray(A.matvec(jnp.asarray(x))) - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7, fn.__name__


def test_compat_atol_semantics():
    A = _spd()
    b = np.random.default_rng(3).standard_normal(256)
    # huge atol -> converges immediately-ish (tolerance dominated by atol)
    x, info = scipy_compat.cg(A, b, rtol=1e-12, atol=1e6)
    assert info == 0


def test_compat_host_linearoperator_callback():
    scipy_linalg = pytest.importorskip("scipy.sparse.linalg")
    A = _spd(8)
    dense = np.asarray(A.todense())
    host_op = scipy_linalg.aslinearoperator(dense)
    b = np.random.default_rng(4).standard_normal(64)
    x, info = scipy_compat.cg(host_op, b, rtol=1e-10, maxiter=500)
    assert info == 0
    r = dense @ np.asarray(x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_compat_aslinearoperator_passthrough():
    A = _spd()
    assert scipy_compat.aslinearoperator(A) is A
    dia = A.to_dia()
    assert scipy_compat.aslinearoperator(dia) is dia
