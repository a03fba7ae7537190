"""Error-model tests: the numerical-robustness behaviors that ARE the spec
(SURVEY.md §5) — zero-rhs early-outs, dimension checks, insufficient-iteration
failures, zero-diagonal detection, invalid-preconditioner gates — mapped from
the reference's SolverError returns to status codes + exceptions."""

import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.errors import (
    IncompatibleMatrixFormat,
    InsufficientIterNum,
    InvalidPreconditioner,
    Status,
    ZeroDiagonalElem,
)
from sprsolve_tpu.utils import problems


def _laplacian_10():
    A = problems.grid_laplacian_dirichlet((10, 10))
    rhs = np.zeros(100)
    problems.set_boundary_condition(rhs, (10, 10), lambda r, c: float(r + c))
    return A, rhs


def test_zero_rhs_early_out():
    # src/bicg_stab.rs:56-60: rhs = 0 → x = 0, Ok((0, ‖rhs‖))
    A, _ = _laplacian_10()
    b = jnp.zeros(100)
    x0 = jnp.ones(100)
    for fn in (sp.bicgstab, sp.minres, sp.cs_minres):
        x, info = fn(A, b, x0, tol=1e-12, max_iter=10)
        assert int(info.iterations) == 0
        assert int(info.status) == Status.CONVERGED
        np.testing.assert_array_equal(np.asarray(x), 0.0)


def test_initial_guess_already_converged():
    # src/bicg_stab.rs:81-83: ‖r0‖ ≤ tol·‖b‖ → Ok((0, rel))
    A, rhs = _laplacian_10()
    x, _ = sp.BiCGStab.new(A, 100).solve(rhs, max_iter=1500, tol=1e-15)
    x2, info = sp.bicgstab(A, jnp.asarray(rhs), x, tol=1e-10, max_iter=100)
    assert int(info.iterations) == 0
    assert bool(info.converged)


def test_dimension_mismatch_raises():
    A, rhs = _laplacian_10()
    with pytest.raises(IncompatibleMatrixFormat):
        sp.BiCGStab.new(A, 99)
    with pytest.raises(IncompatibleMatrixFormat):
        sp.bicgstab(A, jnp.zeros(100), jnp.zeros(50), tol=1e-10, max_iter=10)


def test_solve_dimension_mismatch_raises():
    # the high-level entry must reject a short/long b BEFORE layout padding
    # (pad_vec would otherwise silently zero-extend it) — parity with the
    # reference's API-boundary check, src/bicg_stab.rs:44-52
    A, rhs = _laplacian_10()
    with pytest.raises(IncompatibleMatrixFormat):
        sp.solve(A, rhs[:-1])
    with pytest.raises(IncompatibleMatrixFormat):
        sp.solve(A, jnp.concatenate([jnp.asarray(rhs), jnp.zeros(3)]))
    with pytest.raises(IncompatibleMatrixFormat):
        sp.solve(A, rhs, x0=jnp.zeros(50))


def test_insufficient_iterations():
    A, rhs = _laplacian_10()
    with pytest.raises(InsufficientIterNum):
        sp.BiCGStab.new(A, 100).solve(rhs, max_iter=3, tol=1e-17)
    with pytest.raises(InsufficientIterNum):
        sp.MinRes.new(*(problems.sym_grid_laplacian((8, 8))[0], 64)).solve(
            problems.sym_grid_laplacian((8, 8))[1], max_iter=3, tol=1e-22
        )


def test_gauss_seidel_zero_diagonal():
    # src/gauss_seidel.rs:72-78: |a_ii|² < ε → ZeorDiagonalElem
    A = sp.csr_from_dense(np.array([[1.0, 2.0], [3.0, 0.0]]))
    with pytest.raises(ZeroDiagonalElem):
        sp.GaussSeidel.new(A).solve(np.ones(2), max_iter=10, eps=1e-8)


def test_gauss_seidel_not_square():
    coo = sp.COO(
        data=jnp.asarray([1.0]),
        row=jnp.asarray([0], dtype=jnp.int32),
        col=jnp.asarray([0], dtype=jnp.int32),
        shape=(2, 3),
    )
    with pytest.raises(IncompatibleMatrixFormat):
        sp.GaussSeidel.new(sp.CSR.from_coo(coo))


def test_gauss_seidel_max_iter_zero():
    # src/gauss_seidel.rs:52-54
    A, rhs = _laplacian_10()
    with pytest.raises(InsufficientIterNum):
        sp.GaussSeidel.new(A).solve(rhs, max_iter=0, eps=0.0)


def test_minres_invalid_preconditioner():
    # src/minres.rs:235-244: β² = rᴴM⁻¹r must be positive; a negative diag
    # preconditioner on an SPD-ish residual violates it immediately.
    A, rhs = problems.sym_grid_laplacian((8, 8))
    P = sp.DiagPrecond.new(-np.ones(64))
    with pytest.raises(InvalidPreconditioner):
        sp.MinRes.new(A, 64).precond_solve(P, rhs, max_iter=300, tol=1e-22)


def test_status_names_match_reference_error_enum():
    # one status per reference SolverError variant (src/error.rs:7-22)
    assert {s.name for s in Status} >= {
        "CONVERGED",
        "INSUFFICIENT_ITER",
        "BREAKDOWN",
        "INVALID_PRECONDITIONER",
        "ZERO_DIAGONAL",
        "INCOMPATIBLE_FORMAT",
    }
