"""Mixed-precision iterative refinement: f64 accuracy from an f32 inner
solver, one jitted program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems


def _spd(side=20):
    A, _ = problems.sym_grid_laplacian((side, side))
    dense = -np.asarray(A.todense())
    return sp.csr_from_dense(dense), dense


def test_reaches_f64_accuracy_with_f32_inner():
    A, dense = _spd()
    b = np.random.default_rng(0).standard_normal(400)
    x, info = sp.refine_solve(A, b, inner="cg", tol=1e-13, inner_tol=1e-6)
    info.raise_if_error()
    r = dense @ np.asarray(x) - b
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    assert rel < 1e-12  # far beyond f32's ~1e-7 floor
    assert x.dtype == jnp.float64
    # a handful of outer steps suffice for this conditioning
    assert 1 < int(info.iterations) <= 6


def test_beats_pure_f32_accuracy():
    A, dense = _spd(16)
    b = np.random.default_rng(1).standard_normal(256)
    # pure f32 solve bottoms out near f32 epsilon no matter the tol
    A32 = sp.csr_from_dense(dense.astype(np.float32))
    x32, _ = sp.cg(A32.to_dia(), jnp.asarray(b, jnp.float32), tol=1e-14,
                   max_iter=5000)
    rel32 = np.linalg.norm(dense @ np.asarray(x32, np.float64) - b) \
        / np.linalg.norm(b)
    x, info = sp.refine_solve(A, b, inner="cg", tol=1e-13)
    info.raise_if_error()
    rel = np.linalg.norm(dense @ np.asarray(x) - b) / np.linalg.norm(b)
    assert rel < rel32 * 1e-3  # orders of magnitude past the f32 floor


def test_nonsymmetric_bicgstab_inner():
    A = problems.grid_laplacian_dirichlet((16, 16))  # nonsymmetric
    A = sp.CSR.from_arrays(np.asarray(A.data, np.float64), A.indices,
                           A.indptr, A.shape)
    b = np.zeros(256)
    problems.set_boundary_condition(b, (16, 16), lambda r, c: float(r + c))
    x, info = sp.refine_solve(A, b, inner="bicgstab", tol=1e-13,
                              M="jacobi")
    info.raise_if_error()
    r = np.asarray(A.matvec(jnp.asarray(x))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-12


def test_zero_rhs_and_dtype_guard():
    A, _ = _spd(8)
    x, info = sp.refine_solve(A, np.zeros(64), tol=1e-13)
    assert int(info.iterations) == 0 and np.all(np.asarray(x) == 0)
    from sprsolve_tpu.solvers import refine

    with pytest.raises(sp.errors.IncompatibleMatrixFormat):
        refine(A.to_dia(), A.to_dia(), jnp.zeros(64, jnp.float32), tol=1e-12)


def test_warm_start():
    A, dense = _spd(12)
    b = np.random.default_rng(2).standard_normal(144)
    x1, _ = sp.refine_solve(A, b, inner="cg", tol=1e-13)
    _, info2 = sp.refine_solve(A, b, inner="cg", tol=1e-13, x0=x1)
    assert int(info2.iterations) <= 1


def test_complex_refinement_cs_minres_inner():
    """c128 accuracy from the c64 two-plane inner solve."""
    A, rhs, _ = problems.complex_symmetric_grid_with_diag((10, 10))
    x, info = sp.refine_solve(A, rhs, inner="cs_minres", tol=1e-12,
                              inner_tol=1e-5, inner_max_iter=800)
    info.raise_if_error()
    dense = np.asarray(A.todense())
    want = np.linalg.solve(dense, rhs)
    err = np.abs(np.asarray(x) - want).max()
    assert err < 1e-10  # far beyond c64's ~1e-6 floor
    assert np.iscomplexobj(np.asarray(x))


def test_complex_refinement_bicgstab_inner():
    A, rhs, _ = problems.hermitian_grid_with_diag((8, 8))
    x, info = sp.refine_solve(A, rhs, inner="bicgstab", tol=1e-12,
                              M="jacobi", inner_max_iter=800)
    info.raise_if_error()
    dense = np.asarray(A.todense())
    r = dense @ np.asarray(x) - rhs
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-11


def test_unstructured_matrix_falls_back_to_csr_residuals():
    # > 64 distinct diagonals: to_dia is impossible; residuals ride the CSR
    # path and refinement still reaches f64 accuracy
    rng = np.random.default_rng(9)
    n = 300
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.05)
    dense = (dense + dense.T) / 2 + np.eye(n) * 10
    A = sp.csr_from_dense(dense)
    x, info = sp.refine_solve(A, rng.standard_normal(n), inner="cg",
                              tol=1e-12)
    info.raise_if_error()


def test_complex_cs_minres_with_jacobi_converges():
    """inner='cs_minres' with M='jacobi' builds the real 1/|d| Jacobi (the
    preconditioned Saunders form added beyond the reference) and refines to
    c128 accuracy."""
    A, rhs, _ = problems.complex_symmetric_grid_with_diag((6, 6))
    x, info = sp.refine_solve(A, rhs, inner="cs_minres", M="jacobi", tol=1e-10)
    info.raise_if_error()
    dense = np.asarray(A.todense())
    r = dense @ np.asarray(x) - rhs
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-10


def test_unknown_inner_raises():
    A, _ = _spd(8)
    with pytest.raises(sp.errors.IncompatibleMatrixFormat):
        sp.refine_solve(A, np.ones(64), inner="lsqr", tol=1e-10)


def test_custom_host_preconditioner_object():
    """A plain (non-pytree) object with matvec must work as M — closure
    capture fallback, the pre-cache behavior. (M lives in the inner
    operator's layout: use an unstructured matrix so the inner path is flat
    CSR.)"""
    rng = np.random.default_rng(10)
    n = 144
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.05)
    dense = (dense + dense.T) / 2 + np.eye(n) * 10
    A = sp.csr_from_dense(dense)

    class MyJacobi:
        def __init__(self, d):
            self.dinv = jnp.asarray(1.0 / d, jnp.float32)

        @property
        def shape(self):
            n = self.dinv.shape[0]
            return (n, n)

        def matvec(self, x):
            return x * self.dinv

        def matvec_dot(self, x):
            y = self.matvec(x)
            return y, jnp.vdot(x, y)

    M = MyJacobi(np.asarray(A.diagonal()))
    b = np.random.default_rng(11).standard_normal(144)
    x, info = sp.refine_solve(A, b, inner="cg", M=M, tol=1e-12)
    info.raise_if_error()
    assert np.linalg.norm(dense @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-11
