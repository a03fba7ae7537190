"""Distributed shift-invert eigensolver on the virtual 8-device mesh.

Covers: interior eigenpairs vs a dense eigendecomposition, parity with the
single-chip driver, one-sided search, σ-aware spectrum-safe padding (pad
rows must stay selectable-proof AND keep the inner A − σI solve
nonsingular — identity pads would put an eigenvalue at 1, near typical σ),
the Jacobi-preconditioned inner solve, and the pre-partitioned-unpadded
error path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.parallel import (
    distributed_shift_invert_eigs,
    partition_dia,
)
from sprsolve_tpu.solvers.eigs import shift_invert_eigs
from sprsolve_tpu.utils import problems


def _spd_poisson(side=16):
    A, _ = problems.sym_grid_laplacian((side, side))
    dense = -np.asarray(A.todense())
    return sp.csr_from_dense(dense), dense


def _nearest(w, sigma, k):
    return np.sort(np.array(sorted(w, key=lambda x: abs(x - sigma))[:k]))


def test_matches_dense_and_serial():
    A, dense = _spd_poisson(16)
    w = np.linalg.eigvalsh(dense)
    sigma = float(0.5 * (w[5] + w[6]))
    k = 4
    lam, X, info = distributed_shift_invert_eigs(
        A, k, sigma, tol=1e-7, max_iter=200
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), _nearest(w, sigma, k), atol=1e-6
    )
    # residuals of the returned pairs on the dense A
    Xn = np.asarray(X)
    R = dense @ Xn - Xn * np.asarray(lam)[None, :]
    assert (np.linalg.norm(R, axis=0) / np.abs(np.asarray(lam))).max() < 1e-7

    lam_s, _, info_s = shift_invert_eigs(A, k, sigma, tol=1e-7, max_iter=200)
    info_s.raise_if_error()
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), np.sort(np.asarray(lam_s)), atol=1e-6
    )


@pytest.mark.parametrize("side", ["above", "below"])
def test_one_sided(side):
    A, dense = _spd_poisson(12)
    w = np.linalg.eigvalsh(dense)
    # σ must fall strictly BETWEEN distinct eigenvalues: the grid spectrum
    # has degenerate pairs (w[4] == w[5]), whose midpoint IS the eigenvalue
    # and makes A − σI singular
    wu = np.unique(np.round(w, 8))
    sigma = float(0.5 * (wu[3] + wu[4]))
    k = 3
    lam, _, info = distributed_shift_invert_eigs(
        A, k, sigma, side=side, tol=1e-7, max_iter=200
    )
    info.raise_if_error()
    lam = np.asarray(lam)
    if side == "above":
        assert (lam >= sigma).all()
        want = np.sort(w[w >= sigma])[:k]
    else:
        assert (lam < sigma).all()
        want = np.sort(w[w < sigma])[-k:]
    np.testing.assert_allclose(np.sort(lam), want, atol=1e-6)


def test_padding_is_sigma_safe():
    # 10×10 grid → 100 rows over 8 devices → 4 pad rows. The Poisson
    # spectrum fills (0, 8); identity pad rows would put an eigenvalue at
    # exactly 1.0 — pick σ = 1.0 so that failure mode would (a) make the
    # inner A − σI solve singular on the pad rows and (b) offer LOBPCG a
    # perfect |λ−σ| = 0 candidate. The σ-aware padding (σ + 2D) must keep
    # both from happening.
    A, dense = _spd_poisson(10)
    w = np.linalg.eigvalsh(dense)
    sigma = 1.0
    k = 4
    lam, X, info = distributed_shift_invert_eigs(
        A, k, sigma, tol=1e-7, max_iter=300
    )
    info.raise_if_error()
    assert X.shape == (100, k)
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), _nearest(w, sigma, k), atol=1e-6
    )


def test_preconditioned_inner_solve():
    # diag-dominant SPD system: Jacobi on |diag| is a valid SPD inner
    # preconditioner even for the indefinite A − σI when the shift is small
    # against the diagonal ramp.
    _, dense0 = _spd_poisson(12)
    n = dense0.shape[0]
    ramp = 2.0 + 10.0 * np.arange(n) / n
    dense = dense0 + np.diag(ramp)
    A = sp.csr_from_dense(dense).to_dia()
    w = np.linalg.eigvalsh(dense)
    sigma = float(0.5 * (w[3] + w[4]))
    M = sp.DiagPrecond.new(jnp.asarray(np.abs(np.diag(dense))))
    k = 3
    lam, _, info = distributed_shift_invert_eigs(
        A, k, sigma, M_inner=M, tol=1e-7, max_iter=200
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), _nearest(w, sigma, k), atol=1e-6
    )


def test_prepartitioned_divisible_runs():
    # pre-partitioned operators carry their padded shape, so every row is
    # treated as real — the supported contract is n divisible by the mesh
    # (here 256 = 8·32), where partitioning adds no pad rows at all
    A, dense = _spd_poisson(16)
    parts = partition_dia(A.to_dia(), 8)
    w = np.linalg.eigvalsh(dense)
    wu = np.unique(np.round(w, 8))
    sigma = float(0.5 * (wu[2] + wu[3]))
    lam, X, info = distributed_shift_invert_eigs(
        parts, 2, sigma, tol=1e-7, max_iter=200
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.sort(np.asarray(lam)), _nearest(w, sigma, 2), atol=1e-6
    )
