"""Complex Hermitian solves — port of ``tests/test_complex_solve.rs``: the
manufactured-solution Hermitian grid (x_known[vid] = row + col·i), plain and
diagonally-preconditioned MINRES (with a **real** diagonal on the complex
system, ``src/precond.rs:6-13``), and preconditioned BiCGStab; tol 1e-22."""

import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems

GOLDEN = {
    "minres_complex": 105,
    "precond_minres_complex": 104,
    # 130 before the r2 loop restructure (tail-fused ρ changes XLA's CPU
    # reduction fusion, an ulp-level shift; at tol 1e-22 BiCGStab is near
    # stagnation so the count is rounding-sensitive — residual and solution
    # accuracy are asserted unchanged below)
    "precond_bicgstab_complex_1": 124,
}


def _x_known(rows, cols):
    return np.array([complex(i, j) for i in range(rows) for j in range(cols)])


def test_minres_complex():
    # tests/test_complex_solve.rs:4-33
    A, rhs = problems.hermitian_grid((8, 8))
    dense = np.asarray(A.todense())
    np.testing.assert_array_equal(dense, dense.conj().T)  # Hermitian
    x, (iters, res) = sp.MinRes.new(A, 64).solve(rhs, max_iter=300, tol=1e-22)
    assert res < 1e-22
    assert iters == GOLDEN["minres_complex"]
    assert np.abs(np.asarray(x) - _x_known(8, 8)).max() < 1e-12


def test_precond_minres_complex():
    # tests/test_complex_solve.rs:36-62 — real diag on a complex system
    A, rhs, diag = problems.hermitian_grid_with_diag((8, 8))
    assert diag.dtype == np.float64
    P = sp.DiagPrecond.new(diag)
    x, (iters, res) = sp.MinRes.new(A, 64).precond_solve(
        P, rhs, max_iter=300, tol=1e-22
    )
    assert res < 1e-22
    assert iters == GOLDEN["precond_minres_complex"]
    assert np.abs(np.asarray(x) - _x_known(8, 8)).max() < 1e-12


def test_bicgstab_complex_1():
    # tests/test_complex_solve.rs:64-88
    A, rhs, diag = problems.hermitian_grid_with_diag((8, 8))
    P = sp.DiagPrecond.new(diag)
    x, (iters, res) = sp.BiCGStab.new(A, 64).precond_solve(
        P, rhs, max_iter=300, tol=1e-22
    )
    assert res <= 1e-22
    assert iters == GOLDEN["precond_bicgstab_complex_1"]
    assert np.abs(np.asarray(x) - _x_known(8, 8)).max() < 1e-12
