"""CGS and TFQMR (transpose-free nonsymmetric solvers, beyond the
reference's surface — its nonsymmetric solver is BiCGStab,
``src/bicg_stab.rs``): scipy-oracle solutions, breakdown agreement with
scipy on the classic CGS hazard, preconditioned solve() routing, complex
systems, the TFQMR true-residual gate, jit composition, and the
distributed path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems


def _diag_dominant(n, seed, density=0.05):
    A = sps.random(n, n, density=density, random_state=seed)
    A = A + sps.diags(np.abs(A).sum(axis=1).A1 + 1.0)
    return A.tocsr()


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
@pytest.mark.parametrize("seed", [0, 1])
def test_random_diag_dominant_matches_direct(method, seed):
    n = 120
    S = _diag_dominant(n, seed)
    b = np.random.default_rng(seed + 100).standard_normal(n)
    x_direct = spla.spsolve(S.tocsc(), b)
    fn = getattr(sp, method)
    x, info = fn(sp.csr_from_scipy(S), jnp.asarray(b), tol=1e-13,
                 max_iter=2000)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
def test_breakdown_agrees_with_scipy(method):
    """The Dirichlet-boundary Laplacian with a boundary-supported rhs is a
    classic CGS-family serious breakdown (rho_1 ~ 0).  scipy's cgs/tfqmr
    fail on it too — the predicated BREAKDOWN exit must fire rather than
    returning garbage with CONVERGED."""
    A = problems.grid_laplacian_dirichlet((20, 20))
    b = np.zeros(400)
    problems.set_boundary_condition(b, (20, 20), lambda r, c: float(r + c))
    fn = getattr(sp, method)
    x, info = fn(A, jnp.asarray(b), tol=1e-12, max_iter=800)
    assert int(info.status) == Status.BREAKDOWN
    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    _, sinfo = getattr(spla, method)(S, b, rtol=1e-12, maxiter=800)
    assert sinfo != 0  # scipy fails here as well


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
def test_complex_manufactured_solution(method):
    A, rhs, _diag = problems.complex_symmetric_grid_with_diag((8, 8))
    x_known = np.array(
        [complex(i, j) for i in range(8) for j in range(8)]
    )
    fn = getattr(sp, method)
    x, info = fn(A, jnp.asarray(rhs), tol=1e-12, max_iter=2000)
    info.raise_if_error()
    assert np.abs(np.asarray(x) - x_known).max() < 1e-9


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
def test_preconditioned_solve_routing(method):
    """solve(method=..., M='jacobi') routes through the layout pipeline and
    converges faster than unpreconditioned on a diag-dominant system."""
    n = 150
    S = _diag_dominant(n, 3, density=0.03)
    S = S + sps.diags(np.linspace(1.0, 50.0, n))  # skewed diagonal
    A = sp.csr_from_scipy(S)
    b = np.random.default_rng(7).standard_normal(n)
    x0_, i0 = sp.solve(A, b, method=method, tol=1e-11, max_iter=3000)
    xp, ip = sp.solve(A, b, method=method, M="jacobi", tol=1e-11,
                      max_iter=3000)
    ip.raise_if_error()
    i0.raise_if_error()
    assert int(ip.iterations) <= int(i0.iterations)
    x_direct = spla.spsolve(S.tocsc(), b)
    np.testing.assert_allclose(np.asarray(xp), x_direct, rtol=1e-6, atol=1e-8)


def test_tfqmr_true_residual_gate():
    """TFQMR's loop gates on the quasi-residual bound, but the reported
    residual (and CONVERGED) come from the true residual of the returned x
    — the bound majorizes it, so res <= tol must hold at CONVERGED."""
    n = 120
    S = _diag_dominant(n, 5)
    b = np.random.default_rng(5).standard_normal(n)
    x, info = sp.tfqmr(sp.csr_from_scipy(S), jnp.asarray(b), tol=1e-10,
                       max_iter=2000)
    info.raise_if_error()
    true = np.linalg.norm(S @ np.asarray(x) - b) / np.linalg.norm(b)
    assert float(info.residual) <= 1e-10
    np.testing.assert_allclose(float(info.residual), true, rtol=1e-6)


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
def test_record_residuals_and_jit(method):
    n = 100
    S = _diag_dominant(n, 9)
    A = sp.csr_from_scipy(S)
    b = jnp.asarray(np.random.default_rng(9).standard_normal(n))
    fn = getattr(sp, method)

    @jax.jit
    def run(b_):
        return fn(A, b_, tol=1e-10, max_iter=400, record_residuals=True)

    x, info, hist = run(b)
    info.raise_if_error()
    h = np.asarray(hist)
    it = int(info.iterations)
    assert np.isfinite(h[: it + 1]).all()
    assert h[0] == pytest.approx(1.0)  # x0 = 0: first entry is ||b||/||b||
    assert h[it] <= 1e-10 or np.isnan(h[it + 1: ]).all()


@pytest.mark.parametrize("method", ["cgs", "tfqmr"])
def test_scipy_compat_wrappers(method):
    n = 110
    S = _diag_dominant(n, 11)
    b = np.random.default_rng(11).standard_normal(n)
    from sprsolve_tpu import scipy_compat

    x, code = getattr(scipy_compat, method)(S, b, rtol=1e-11)
    assert code == 0
    x_direct = spla.spsolve(S.tocsc(), b)
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method_fn", ["cgs", "tfqmr"])
def test_distributed(method_fn):
    """Row-partitioned solve over the 8-device mesh: same iteration class
    and solution as single-device."""
    from sprsolve_tpu.parallel import distributed_solve

    A = problems.poisson3d(12, 12, 12, dtype=np.float64)
    n = A.shape[0]
    b = np.random.default_rng(13).standard_normal(n)
    fn = getattr(sp, method_fn)
    x1, i1 = fn(A, jnp.asarray(b), tol=1e-11, max_iter=1500)
    i1.raise_if_error()
    xd, idist = distributed_solve(fn, A, b, tol=1e-11, max_iter=1500)
    idist.raise_if_error()
    np.testing.assert_allclose(np.asarray(xd), np.asarray(x1), rtol=1e-7,
                               atol=1e-9)
