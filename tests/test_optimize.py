"""Operator-optimization tests: format selection and the complex-plane
Pallas wrapper (interpret mode)."""


import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems


def test_optimize_picks_pallas_dia_for_stencil():
    A = problems.grid_laplacian_dirichlet((16, 16), dtype=np.float32)
    op = sp.optimize(A)
    assert isinstance(op, sp.PaddedDIA)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(256).astype(np.float32))
    got = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(x))))
    np.testing.assert_allclose(got, np.asarray(A.matvec(x)), rtol=1e-5, atol=1e-5)


def test_optimize_routes_x64_to_xla_dia():
    # f64 has no Mosaic lane-rotate lowering; fidelity dtypes use XLA DIA
    A = problems.grid_laplacian_dirichlet((16, 16))
    op = sp.optimize(A)
    assert isinstance(op, sp.DIA)


def test_optimize_picks_ell_for_random_pattern():
    import scipy.sparse as sps

    S = sps.random(300, 300, density=0.02, random_state=0, format="csr")
    S = S + sps.eye(300)
    A = sp.csr_from_scipy(S)
    op = sp.optimize(A)
    assert isinstance(op, sp.ELL)


def test_complex_padded_dia_matches_oracle():
    A, rhs = problems.hermitian_grid((8, 8), dtype=np.complex64)
    dia = A.to_dia()
    op = sp.ComplexPaddedDIA.from_dia(dia)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(64)
        + 1j * np.random.default_rng(2).standard_normal(64)
    )
    got = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(x))))
    want = np.asarray(A.matvec(x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_complex_solve_via_pallas_layout():
    """CS-MINRES on the complex-symmetric system entirely in kernel layout
    (c64 — the kernel dtype; c128 fidelity uses the XLA path)."""
    A, rhs, _ = problems.complex_symmetric_grid_with_diag((8, 8), dtype=np.complex64)
    op = sp.ComplexPaddedDIA.from_dia(A.to_dia())
    b2 = op.pad_vec(jnp.asarray(rhs))
    x2, info = sp.cs_minres(op, b2, tol=1e-5, max_iter=300)
    info.raise_if_error()
    x = op.unpad_vec(x2)
    xk = np.array([complex(i, j) for i in range(8) for j in range(8)])
    assert np.abs(np.asarray(x) - xk).max() < 1e-2


def test_real_planes_adapter():
    """Complex solve with only real arrays crossing the jit boundary —
    backends without complex device buffers can still run complex systems."""
    import jax

    A, rhs, _ = problems.complex_symmetric_grid_with_diag((8, 8), dtype=np.complex64)
    op = sp.ComplexPaddedDIA.from_dia(A.to_dia())
    b2 = np.asarray(op.pad_vec(jnp.asarray(rhs)))
    solve = jax.jit(
        lambda a, br, bi: sp.with_real_planes(sp.cs_minres)(
            a, br, bi, tol=1e-5, max_iter=300
        )
    )
    xr, xi, info = solve(op, jnp.asarray(b2.real), jnp.asarray(b2.imag))
    info.raise_if_error()
    x = np.asarray(op.unpad_vec(np.asarray(xr) + 1j * np.asarray(xi)))
    xk = np.array([complex(i, j) for i in range(8) for j in range(8)])
    assert np.abs(x - xk).max() < 1e-2
