"""Complex-*symmetric* (non-Hermitian) solves — port of
``tests/test_complex_solve2.rs`` (preconditioned BiCGStab with a complex
diagonal), plus the CS-MINRES coverage the reference never activated
(``tests/test_minres.rs:14-15`` has it commented out)."""

import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems

GOLDEN = {
    "precond_bicgstab_complex_2": 40,
    "cs_minres": 77,
    "cs_minres_real_sym": 34,
}


def _x_known(rows, cols):
    return np.array([complex(i, j) for i in range(rows) for j in range(cols)])


def _problem():
    A, rhs, diag = problems.complex_symmetric_grid_with_diag((8, 8))
    dense = np.asarray(A.todense())
    np.testing.assert_array_equal(dense, dense.T)  # symmetric, NOT Hermitian
    assert np.abs(dense - dense.conj().T).max() > 1.0
    return A, rhs, diag


def test_bicgstab_complex_2():
    # tests/test_complex_solve2.rs:5-28
    A, rhs, diag = _problem()
    P = sp.DiagPrecond.new(diag)
    x, (iters, res) = sp.BiCGStab.new(A, 64).precond_solve(
        P, rhs, max_iter=300, tol=1e-22
    )
    assert res <= 1e-22
    assert iters == GOLDEN["precond_bicgstab_complex_2"]
    assert np.abs(np.asarray(x) - _x_known(8, 8)).max() < 1e-12


def test_cs_minres_complex_symmetric():
    # NEW coverage: the reference exports CSMinRes but never tests it.
    A, rhs, _ = _problem()
    x, (iters, res) = sp.CSMinRes.new(A, 64).solve(rhs, max_iter=300, tol=1e-22)
    assert res < 1e-22
    assert iters == GOLDEN["cs_minres"]
    assert np.abs(np.asarray(x) - _x_known(8, 8)).max() < 1e-12


def test_cs_minres_reduces_to_minres_on_real_symmetric():
    # On a real symmetric system conj() is the identity, so the Saunders
    # process must match the Lanczos process step for step.
    A, rhs = problems.sym_grid_laplacian((8, 8))
    x1, (it1, res1) = sp.MinRes.new(A, 64).solve(rhs, max_iter=300, tol=1e-22)
    x2, (it2, res2) = sp.CSMinRes.new(A, 64).solve(rhs, max_iter=300, tol=1e-22)
    assert it1 == it2 == GOLDEN["cs_minres_real_sym"]
    assert res1 == res2
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
