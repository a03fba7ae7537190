"""Multicolor Gauss-Seidel tests: coloring validity, sweep equivalence to a
permuted-order exact GS, solve convergence, and the GS-preconditioned
BiCGStab combination (BASELINE.md config #4)."""

import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.solvers.redblack import ColoredELL, greedy_color
from sprsolve_tpu.utils import problems


def _dirichlet(shape):
    A = problems.grid_laplacian_dirichlet(shape)
    rhs = np.zeros(shape[0] * shape[1])
    problems.set_boundary_condition(rhs, shape, lambda r, c: float(r + c))
    return A, rhs


def test_coloring_is_proper():
    A, _ = _dirichlet((12, 12))
    colors = greedy_color(A)
    rows = np.asarray(A.row_ids)
    cols = np.asarray(A.indices)
    off = rows != cols
    # no edge connects two rows of the same color
    assert not np.any(colors[rows[off]] == colors[cols[off]])
    # greedy is proper but not necessarily optimal; a 5-point stencil stays
    # within a handful of classes
    assert colors.max() + 1 <= 4


def test_sweep_is_gs_in_color_order():
    """A multicolor sweep must equal an exact sequential GS sweep done in the
    permuted (color-major) row order."""
    A, b = _dirichlet((8, 8))
    colored = ColoredELL.from_csr(A)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(64)

    x_rb = np.asarray(colored.sweep(jnp.asarray(b), jnp.asarray(x0)))

    # reference: scalar GS in the same row order
    dense = np.asarray(A.todense())
    diag = np.diag(dense).copy()
    x_ref = x0.copy()
    for i in np.asarray(colored.perm):
        sigma = dense[i] @ x_ref - diag[i] * x_ref[i]
        x_ref[i] = (b[i] - sigma) / diag[i]
    np.testing.assert_allclose(x_rb, x_ref, rtol=1e-13, atol=1e-13)


def test_redblack_solve_converges():
    A, b = _dirichlet((10, 10))
    colored = ColoredELL.from_csr(A)
    x, info = sp.gauss_seidel_redblack(
        colored, jnp.asarray(b), max_iter=500, eps=1e-12
    )
    info.raise_if_error()
    r = np.asarray(A.matvec(x)) - b
    assert np.linalg.norm(r) <= 1e-12 * np.linalg.norm(b)


def test_redblack_exact_fixed_point():
    # power-of-two diagonals → exact fixed point, like the sequential test
    A, b = _dirichlet((10, 10))
    colored = ColoredELL.from_csr(A)
    x, info = sp.gauss_seidel_redblack(colored, jnp.asarray(b), max_iter=500, eps=0.0)
    info.raise_if_error()
    assert float(info.residual) == 0.0


def test_gs_preconditioned_bicgstab():
    # BASELINE config #4 combination: BiCGStab + multicolor-GS preconditioner.
    A, b = _dirichlet((20, 20))
    M = sp.MulticolorGSPrecond(ColoredELL.from_csr(A), sweeps=2)
    x_p, info_p = sp.bicgstab(A, jnp.asarray(b), M=M, tol=1e-14, max_iter=1500)
    info_p.raise_if_error()
    x_j, info_j = sp.bicgstab(A, jnp.asarray(b), tol=1e-14, max_iter=1500)
    r = np.asarray(A.matvec(x_p)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-11
    # the GS preconditioner should cut the iteration count substantially
    assert int(info_p.iterations) < int(info_j.iterations) // 2
