"""Multi-RHS solvers: block CG (SpMM + Gram reductions) and the vmap
batching adapter.  Oracle: per-column true residuals in NumPy; block CG's
shared-Krylov property is asserted as iterations <= single-rhs CG."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems


def _spd_dense(shape=(16, 16)):
    A, _ = problems.sym_grid_laplacian(shape)
    return -np.asarray(A.todense())


def test_block_cg_converges_all_columns():
    dense = _spd_dense()
    A = sp.csr_from_dense(dense)
    B = np.random.default_rng(0).standard_normal((256, 8))
    X, info = sp.block_cg(A.to_dia(), jnp.asarray(B), tol=1e-10, max_iter=600)
    info.raise_if_error()
    assert int(info.status) == Status.CONVERGED
    R = dense @ np.asarray(X) - B
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert np.all(rel < 1e-9)


def test_block_cg_no_more_iterations_than_single():
    """Shared Krylov space: the block solve needs no more iterations than
    the worst single-rhs CG on the same columns."""
    dense = _spd_dense()
    A = sp.csr_from_dense(dense).to_dia()
    B = np.random.default_rng(1).standard_normal((256, 4))
    X, info = sp.block_cg(A, jnp.asarray(B), tol=1e-10, max_iter=600)
    info.raise_if_error()
    worst = 0
    for j in range(4):
        _, info_j = sp.cg(A, jnp.asarray(B[:, j]), tol=1e-10, max_iter=600)
        worst = max(worst, int(info_j.iterations))
    assert int(info.iterations) <= worst


def test_block_cg_jacobi_precond():
    dense = _spd_dense()
    scal = np.linspace(1.0, 100.0, 256)
    dense = dense * scal[:, None] * scal[None, :]  # SPD rescale
    A = sp.csr_from_dense(dense)
    B = np.random.default_rng(2).standard_normal((256, 6))
    M = sp.DiagPrecond.new(A.diagonal())
    X, info = sp.block_cg(
        A.to_dia(), jnp.asarray(B), M=M, tol=1e-10, max_iter=2000
    )
    _, info_u = sp.block_cg(A.to_dia(), jnp.asarray(B), tol=1e-10, max_iter=2000)
    info.raise_if_error()
    R = dense @ np.asarray(X) - B
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert np.all(rel < 1e-8)
    assert int(info.iterations) < int(info_u.iterations)


def test_block_cg_zero_column():
    """A zero rhs column converges at iteration 0 with x = 0 and does not
    poison the other columns."""
    dense = _spd_dense((8, 8))
    A = sp.csr_from_dense(dense).to_dia()
    rng = np.random.default_rng(3)
    B = rng.standard_normal((64, 3))
    B[:, 1] = 0.0
    X, info = sp.block_cg(A, jnp.asarray(B), tol=1e-12, max_iter=300)
    info.raise_if_error()
    X = np.asarray(X)
    assert np.linalg.norm(X[:, 1]) < 1e-10
    for j in (0, 2):
        r = np.linalg.norm(dense @ X[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
        assert r < 1e-11


def test_block_cg_not_pd_breaks_down():
    n = 32
    dense = -np.eye(n)  # negative definite
    B = np.ones((n, 2))
    X, info = sp.block_cg(
        sp.csr_from_dense(dense).to_dia(), jnp.asarray(B), tol=1e-12, max_iter=50
    )
    assert int(info.status) == Status.BREAKDOWN


def test_block_cg_complex_hermitian():
    A, _ = problems.hermitian_grid((8, 8))
    H = np.asarray(A.todense())  # Hermitian but indefinite
    # shift to Hermitian positive definite
    shift = abs(float(np.linalg.eigvalsh(-H).min())) + 1.0
    dense = -H + shift * np.eye(64)
    rng = np.random.default_rng(4)
    B = rng.standard_normal((64, 4)) + 1j * rng.standard_normal((64, 4))
    X, info = sp.block_cg(
        sp.csr_from_dense(dense), jnp.asarray(B), tol=1e-10, max_iter=500
    )
    info.raise_if_error()
    R = dense @ np.asarray(X) - B
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert np.all(rel < 1e-9)


def test_block_cg_jittable():
    dense = _spd_dense((8, 8))
    A = sp.csr_from_dense(dense).to_dia()
    B = jnp.asarray(np.random.default_rng(5).standard_normal((64, 4)))
    run = jax.jit(lambda a, b: sp.block_cg(a, b, tol=1e-10, max_iter=300))
    X, info = run(A, B)
    assert int(info.status) == Status.CONVERGED


def test_batched_bicgstab():
    """The vmap adapter: per-column info, answers match column-by-column."""
    A = problems.grid_laplacian_dirichlet((12, 12))
    dense = np.asarray(A.todense())
    rng = np.random.default_rng(6)
    B = rng.standard_normal((144, 5))
    X, info = sp.batched(sp.bicgstab)(A, jnp.asarray(B), tol=1e-12, max_iter=800)
    assert info.iterations.shape == (5,)
    assert np.all(np.asarray(info.status) == Status.CONVERGED)
    R = dense @ np.asarray(X) - B
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert np.all(rel < 1e-10)
    # column-wise equivalence with the single-rhs solver
    x0, info0 = sp.bicgstab(A, jnp.asarray(B[:, 0]), tol=1e-12, max_iter=800)
    np.testing.assert_allclose(np.asarray(X[:, 0]), np.asarray(x0), rtol=1e-8)


def test_batched_minres_mixed_convergence():
    """Columns needing different iteration counts all report their own."""
    A, rhs = problems.sym_grid_laplacian((8, 8))
    dense = np.asarray(A.todense())
    B = np.stack([rhs, 1e-3 * rhs + 0.0], axis=1)
    X, info = sp.batched(sp.minres)(
        sp.csr_from_dense(dense), jnp.asarray(B), tol=1e-10, max_iter=300
    )
    its = np.asarray(info.iterations)
    assert np.all(np.asarray(info.status) == Status.CONVERGED)
    R = dense @ np.asarray(X) - B
    assert np.linalg.norm(R) / np.linalg.norm(B) < 1e-8


def test_block_cg_distributed():
    """Row-partitioned block CG on the 8-device mesh: Gram matrices psum."""
    from functools import partial

    from sprsolve_tpu.parallel import distributed_solve

    dense = _spd_dense()
    A = sp.csr_from_dense(dense)
    B = np.random.default_rng(7).standard_normal((256, 4))
    X, info = distributed_solve(
        sp.block_cg, A.to_dia(), B, tol=1e-10, max_iter=600
    )
    info.raise_if_error()
    R = dense @ np.asarray(X) - B
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert np.all(rel < 1e-8)
