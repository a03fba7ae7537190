"""Distributed LOBPCG on the virtual 8-device mesh.

Covers: block-SpMM parity of both halo strategies, eigenpair correctness
vs a dense eigendecomposition, parity with the single-chip solver,
spectrum-safe row padding, Jacobi preconditioning, largest-end search, and
HLO certification that the per-iteration collective structure is
k-independent (one halo exchange for the whole block, Gram-sized psums
only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import sprsolve_tpu as sp
from sprsolve_tpu.parallel import (
    distributed_lobpcg,
    partition_csr,
    partition_dia,
)
from sprsolve_tpu.solvers.lobpcg import lobpcg
from sprsolve_tpu.utils import problems


def _spd_poisson(side=16):
    A, _ = problems.sym_grid_laplacian((side, side))
    dense = -np.asarray(A.todense())
    return sp.csr_from_dense(dense), dense


def test_matmat_matches_per_column_matvec():
    A, _ = _spd_poisson(16)
    n = 256
    X = jnp.asarray(np.random.default_rng(1).standard_normal((n, 5)))
    want = np.stack(
        [np.asarray(A.matvec(X[:, i])) for i in range(5)], axis=1
    )
    mesh = jax.make_mesh((8,), ("rows",))
    for parts in (partition_csr(A, 8), partition_dia(A.to_dia(), 8)):
        with jax.set_mesh(mesh):
            Y = jax.shard_map(
                lambda op, Xl: op.matmat(Xl),
                mesh=mesh,
                in_specs=(parts.pspec("rows"), P("rows", None)),
                out_specs=P("rows", None),
            )(parts, X)
        np.testing.assert_allclose(np.asarray(Y), want, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("layout", ["ell", "dia"])
def test_distributed_lobpcg_matches_dense(layout):
    A, dense = _spd_poisson(16)
    op = A if layout == "ell" else A.to_dia()
    k = 4
    lam, X, info = distributed_lobpcg(op, k, tol=1e-9, max_iter=400)
    info.raise_if_error()
    want = np.linalg.eigvalsh(dense)[:k]
    np.testing.assert_allclose(np.asarray(lam), want, atol=1e-7)
    Xn = np.asarray(X)
    R = dense @ Xn - Xn * np.asarray(lam)[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6
    # global orthonormality of the row-sharded iterates (CholQR2's job)
    np.testing.assert_allclose(Xn.T @ Xn, np.eye(k), atol=1e-8)


def test_parity_with_single_chip():
    A, _ = _spd_poisson(12)
    k = 3
    n = A.shape[0]
    X0 = jnp.asarray(np.random.default_rng(7).standard_normal((n, k)))
    lam_s, _, info_s = lobpcg(A, X0, tol=1e-9, max_iter=400)
    info_s.raise_if_error()
    lam_d, _, info_d = distributed_lobpcg(A, X0=X0, tol=1e-9, max_iter=400)
    info_d.raise_if_error()
    # same problem, same tolerance — eigenvalues agree to the tolerance even
    # though the orthonormalization (QR vs CholQR2) differs
    np.testing.assert_allclose(
        np.asarray(lam_d), np.asarray(lam_s), rtol=1e-8, atol=1e-10
    )


def test_padding_is_spectrum_safe():
    # 100 rows over 8 devices → 104 pad rows whose diagonal sits ABOVE the
    # spectrum (Gershgorin), so Rayleigh-Ritz can never select a pad pair —
    # identity padding would put spurious eigenvalues at 1.0, inside the
    # Poisson spectrum (0, 8).
    A, dense = _spd_poisson(10)
    k = 4
    lam, X, info = distributed_lobpcg(A, k, tol=1e-9, max_iter=400)
    info.raise_if_error()
    assert X.shape == (100, k)
    want = np.linalg.eigvalsh(dense)[:k]
    np.testing.assert_allclose(np.asarray(lam), want, atol=1e-7)


def test_preconditioned_variable_diag():
    # SPD system with strongly variable diagonal: Poisson + diag ramp; the
    # Jacobi preconditioner shards with the rows.
    _, dense0 = _spd_poisson(12)
    n = dense0.shape[0]
    ramp = 1.0 + 9.0 * np.arange(n) / n
    dense = dense0 + np.diag(ramp)
    A = sp.csr_from_dense(dense).to_dia()
    M = sp.DiagPrecond.new(jnp.asarray(np.diag(dense)))
    k = 3
    lam_m, _, info_m = distributed_lobpcg(A, k, M=M, tol=1e-9, max_iter=400)
    info_m.raise_if_error()
    want = np.linalg.eigvalsh(dense)[:k]
    np.testing.assert_allclose(np.asarray(lam_m), want, atol=1e-7)


def test_largest_end():
    A, dense = _spd_poisson(12)
    k = 3
    lam, X, info = distributed_lobpcg(
        A, k, largest=True, tol=1e-9, max_iter=400
    )
    info.raise_if_error()
    want = np.linalg.eigvalsh(dense)[-k:]
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, atol=1e-7)


def _compiled_dist_lobpcg_hlo(k):
    A, _ = _spd_poisson(16)
    parts = partition_dia(A.to_dia(), 8)
    mesh = jax.make_mesh((8,), ("rows",))
    X0 = jnp.asarray(np.random.default_rng(0).standard_normal((256, k)))

    def run(A_, X_):
        return lobpcg(A_, X_, tol=1e-9, max_iter=50, axis_name="rows")

    with jax.set_mesh(mesh):
        fn = jax.jit(
            jax.shard_map(
                run,
                mesh=mesh,
                in_specs=(parts.pspec("rows"), P("rows", None)),
                out_specs=(P(), P("rows", None), sp.SolveInfo(P(), P(), P())),
                check_vma=False,
            )
        )
        return fn.lower(parts, X0).compile().as_text()


def test_collective_structure_is_k_independent():
    """The headline distributed-LOBPCG property: per-iteration collectives
    are 2 halo ppermutes (whole-block exchange) + Gram-sized all-reduces,
    REGARDLESS of block size k."""
    from sprsolve_tpu.utils.hlo import while_body_collective_counts

    counts = {k: while_body_collective_counts(_compiled_dist_lobpcg_hlo(k))
              for k in (2, 4)}
    for k, c in counts.items():
        assert c.get("collective-permute", 0) == 2, (k, c)
        assert c.get("all-gather", 0) == 0, (k, c)
    # identical collective counts for k=2 and k=4
    assert counts[2] == counts[4], counts
