"""Chebyshev polynomial preconditioner: SPD acceleration and linearity."""

import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu import debug
from sprsolve_tpu.utils import problems


def _spd_poisson():
    # -Laplacian (folded) is negative definite; negate for SPD
    A, _ = problems.sym_grid_laplacian((16, 16))
    dense = -np.asarray(A.todense())
    return sp.csr_from_dense(dense)


def test_chebyshev_is_linear_operator():
    A = _spd_poisson()
    M = sp.ChebyshevPrecond(A=A.to_dia(), lmin=0.1, lmax=8.0, degree=4)
    assert debug.check_operator(M, jnp.zeros(256))


def test_chebyshev_accelerates_minres():
    A = _spd_poisson()
    b = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    # spectrum of the 2-D 5-point Laplacian is within (0, 8)
    M = sp.ChebyshevPrecond(A=A.to_dia(), lmin=0.08, lmax=8.0, degree=6)
    x_p, info_p = sp.minres(A.to_dia(), b, M=M, tol=1e-10, max_iter=2000)
    info_p.raise_if_error()
    x_j, info_j = sp.minres(A.to_dia(), b, tol=1e-10, max_iter=2000)
    info_j.raise_if_error()
    assert int(info_p.iterations) < int(info_j.iterations) // 2
    r = np.asarray(A.matvec(x_p)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_chebyshev_accelerates_bicgstab():
    A = _spd_poisson()
    b = jnp.asarray(np.random.default_rng(1).standard_normal(256))
    M = sp.ChebyshevPrecond(A=A.to_dia(), lmin=0.08, lmax=8.0, degree=4)
    x_p, info_p = sp.bicgstab(A.to_dia(), b, M=M, tol=1e-12, max_iter=2000)
    info_p.raise_if_error()
    x_j, info_j = sp.bicgstab(A.to_dia(), b, tol=1e-12, max_iter=2000)
    assert int(info_p.iterations) < int(info_j.iterations) // 2


def test_estimate_lmax():
    A = _spd_poisson()
    est = sp.ChebyshevPrecond.estimate_lmax(
        A.to_dia(), jnp.asarray(np.random.default_rng(2).standard_normal(256))
    )
    assert 6.0 < est <= 8.2  # true λmax just under 8
