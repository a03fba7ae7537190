"""Random-system property tests: solver outputs vs scipy direct solutions,
across matrix classes and dtypes (beyond the reference's fixed fixtures)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

import sprsolve_tpu as sp


def _spd(n, seed, density=0.05):
    rng = np.random.default_rng(seed)
    A = sps.random(n, n, density=density, random_state=seed)
    A = A @ A.T + sps.eye(n) * n * 0.1
    return A.tocsr()


def _diag_dominant(n, seed, density=0.05):
    A = sps.random(n, n, density=density, random_state=seed)
    A = A + sps.diags(np.abs(A).sum(axis=1).A1 + 1.0)
    return A.tocsr()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bicgstab_random_diag_dominant(seed):
    n = 120
    S = _diag_dominant(n, seed)
    b = np.random.default_rng(seed + 100).standard_normal(n)
    x_direct = spla.spsolve(S.tocsc(), b)
    x, info = sp.bicgstab(sp.csr_from_scipy(S), jnp.asarray(b), tol=1e-13, max_iter=2000)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minres_random_spd(seed):
    n = 100
    S = _spd(n, seed)
    b = np.random.default_rng(seed + 200).standard_normal(n)
    x_direct = spla.spsolve(S.tocsc(), b)
    x, info = sp.minres(sp.csr_from_scipy(S), jnp.asarray(b), tol=1e-13, max_iter=2000)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_minres_random_hermitian(seed):
    n = 80
    rng = np.random.default_rng(seed)
    A = sps.random(n, n, density=0.06, random_state=seed).toarray().astype(complex)
    A = A + 1j * sps.random(n, n, density=0.06, random_state=seed + 7).toarray()
    A = A + A.conj().T + np.eye(n) * n * 0.2  # Hermitian, well conditioned
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_direct = np.linalg.solve(A, b)
    x, info = sp.minres(sp.csr_from_dense(A), jnp.asarray(b), tol=1e-13, max_iter=2000)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_cs_minres_random_complex_symmetric(seed):
    n = 80
    rng = np.random.default_rng(seed)
    A = sps.random(n, n, density=0.06, random_state=seed).toarray().astype(complex)
    A = A + 1j * sps.random(n, n, density=0.06, random_state=seed + 13).toarray()
    A = A + A.T + np.eye(n) * (n * 0.2 + 0.3j * n)  # symmetric, NOT Hermitian
    assert np.abs(A - A.T).max() < 1e-12
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_direct = np.linalg.solve(A, b)
    x, info = sp.cs_minres(sp.csr_from_dense(A), jnp.asarray(b), tol=1e-13, max_iter=2000)
    info.raise_if_error()
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-6, atol=1e-8)


def test_gauss_seidel_random_diag_dominant():
    n = 60
    S = _diag_dominant(n, 5, density=0.08)
    b = np.random.default_rng(6).standard_normal(n)
    x_direct = spla.spsolve(S.tocsc(), b)
    x, (iters, res) = sp.GaussSeidel.new(sp.csr_from_scipy(S)).solve(
        b, max_iter=5000, eps=1e-14
    )
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-9, atol=1e-11)
