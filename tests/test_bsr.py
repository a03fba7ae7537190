"""BSR operator: block assembly, SpMV/SpMM vs the CSR oracle, solver use."""

import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems


def test_bsr_matches_csr_oracle():
    import scipy.sparse as sps

    S = sps.random(300, 300, density=0.03, random_state=0, format="csr")
    S = S + sps.eye(300) * 6
    A = sp.csr_from_scipy(S)
    bsr = sp.BSR.from_csr(A, bs=32)
    assert 0 < bsr.fill_ratio <= 1
    x = jnp.asarray(np.random.default_rng(0).standard_normal(300))
    np.testing.assert_allclose(
        np.asarray(bsr.matvec(x)), np.asarray(A.matvec(x)), rtol=1e-12, atol=1e-12
    )
    X = jnp.asarray(np.random.default_rng(1).standard_normal((300, 3)))
    want = np.stack([np.asarray(A.matvec(X[:, j])) for j in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(bsr.matmat(X)), want, rtol=1e-12, atol=1e-12)


def test_bsr_diagonal_and_padding():
    A = problems.grid_laplacian_dirichlet((13, 13))  # n=169, not a bs multiple
    bsr = sp.BSR.from_csr(A, bs=32)
    assert bsr.padded_dim % 32 == 0 and bsr.shape == (169, 169)
    np.testing.assert_allclose(
        np.asarray(bsr.diagonal()), np.asarray(A.diagonal()), rtol=1e-15
    )


def test_bicgstab_on_bsr():
    A = problems.grid_laplacian_dirichlet((20, 20))
    rhs = np.zeros(400)
    problems.set_boundary_condition(rhs, (20, 20), lambda r, c: float(r + c))
    bsr = sp.BSR.from_csr(A, bs=64)
    x, info = sp.bicgstab(bsr, jnp.asarray(rhs), tol=1e-14, max_iter=1500)
    info.raise_if_error()
    r = np.asarray(A.matvec(x)) - rhs
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-11


def test_reorder_rcm_preserves_solve():
    import scipy.sparse as sps

    S = sps.random(200, 200, density=0.03, random_state=3, format="csr")
    S = S + S.T + sps.eye(200) * 10
    A = sp.csr_from_scipy(S.tocsr())
    Ap, perm = sp.reorder_rcm(A)
    from sprsolve_tpu import native

    bw_before = native.csr_bandwidth(
        200, np.asarray(A.indptr, np.int64), np.asarray(A.indices, np.int32)
    )
    bw_after = native.csr_bandwidth(
        200, np.asarray(Ap.indptr, np.int64), np.asarray(Ap.indices, np.int32)
    )
    assert bw_after <= bw_before
    # solve the permuted system, un-permute, check against the original
    b = np.random.default_rng(4).standard_normal(200)
    x_p, info = sp.bicgstab(Ap, jnp.asarray(b[perm]), tol=1e-12, max_iter=2000)
    info.raise_if_error()
    x = np.empty(200)
    x[perm] = np.asarray(x_p)
    assert np.linalg.norm(S @ x - b) / np.linalg.norm(b) < 1e-9
