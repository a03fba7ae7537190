"""Chronopoulos–Gear single-synchronization CG: convergence parity with
plain CG, breakdown semantics, and the HLO-certified claim that its while
body carries exactly ONE all-reduce round per iteration (plain CG needs
two dependent rounds).  The distributed-latency counterpart of the comm-
volume accounting in test_comm_volume.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems
from sprsolve_tpu.utils.hlo import while_body_collective_counts


def _spd_poisson(dtype=np.float64):
    A = problems.poisson3d(8, 8, 8, dtype=dtype)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(A.shape[0]).astype(dtype)
    return A, b


def test_matches_cg_solution_and_iterations():
    A, b = _spd_poisson()
    x1, i1 = sp.cg(A, jnp.asarray(b), tol=1e-11, max_iter=600)
    x2, i2 = sp.cg_single_sync(A, jnp.asarray(b), tol=1e-11, max_iter=600)
    i1.raise_if_error()
    i2.raise_if_error()
    # identical Krylov iteration in exact arithmetic: counts match within
    # rounding slack, solutions agree to the tolerance scale
    assert abs(int(i1.iterations) - int(i2.iterations)) <= 3
    r = np.asarray(A.matvec(x2)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)


def test_preconditioned_f32():
    A = problems.poisson3d(10, 10, 10, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    M = sp.DiagPrecond.new(np.asarray(A.diagonal()))
    x, info = sp.cg_single_sync(A, jnp.asarray(b), M=M, tol=1e-5,
                                max_iter=500)
    info.raise_if_error()
    r = np.asarray(A.matvec(x)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 2e-5


def test_hermitian_complex():
    # manufactured Hermitian PD system (hermitian_grid is indefinite — CG
    # territory needs B^H B + I)
    rng = np.random.default_rng(2)
    Bm = rng.standard_normal((48, 48)) + 1j * rng.standard_normal((48, 48))
    dense = Bm.conj().T @ Bm + 48 * np.eye(48)
    A = sp.csr_from_dense(dense)
    x_known = rng.standard_normal(48) + 1j * rng.standard_normal(48)
    b = dense @ x_known
    x, info = sp.cg_single_sync(A, jnp.asarray(b), tol=1e-12, max_iter=600)
    info.raise_if_error()
    assert np.abs(np.asarray(x) - x_known).max() < 1e-8


def test_breakdown_on_indefinite():
    # an indefinite diagonal matrix: the delta-recurrence PD gate must exit
    # with BREAKDOWN like plain cg's p^H A p gate
    d = np.ones(32)
    d[3] = -1.0
    A = sp.csr_from_dense(np.diag(d))
    rng = np.random.default_rng(1)
    b = rng.standard_normal(32)
    _, info = sp.cg_single_sync(A, jnp.asarray(b), tol=1e-12, max_iter=100)
    assert int(info.status) == int(Status.BREAKDOWN)


def test_record_residuals_boundary():
    A, b = _spd_poisson()
    x, info, hist = sp.cg_single_sync(
        A, jnp.asarray(b), tol=1e-11, max_iter=600, record_residuals=True
    )
    info.raise_if_error()
    its = int(info.iterations)
    h = np.asarray(hist)
    assert np.isfinite(h[: its + 1]).all()
    assert h[its] == pytest.approx(float(info.residual), rel=1e-6)


def test_solve_method_reachable():
    A, b = _spd_poisson(np.float32)
    x, info = sp.solve(A, b.astype(np.float32), method="cg_single_sync",
                       M="jacobi", tol=1e-5, max_iter=500)
    info.raise_if_error()
    r = np.asarray(A.matvec(jnp.asarray(x))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 2e-5


def _compiled_hlo(solver, nd=8, side=24):
    from sprsolve_tpu.parallel.dist_operator import partition_dia
    from sprsolve_tpu.parallel.solve import make_solver_specs

    A = problems.grid_laplacian_dirichlet((side, side), dtype=np.float32)
    dia = A.to_dia()
    A_parts = partition_dia(dia, nd, "rows")
    mesh = jax.make_mesh((nd,), ("rows",), devices=jax.devices()[:nd])
    in_specs, out_specs = make_solver_specs(A_parts, None, "rows")

    def run(A_, b_, x_):
        return solver(A_, b_, x_, tol=1e-6, max_iter=200, axis_name="rows")

    sharded = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))
    n_pad = A_parts.shape[0]
    z = jnp.zeros(n_pad, jnp.float32)
    return sharded.lower(A_parts, z, z).compile().as_text()


def test_one_allreduce_round_per_iteration():
    """The claim, certified from compiled HLO: cg_single_sync's while body
    contains exactly ONE all-reduce (the fused (gamma, delta, |r|^2) psum);
    plain cg needs at least two dependent rounds (p^H A p gates the update
    that feeds r.z / |r|)."""
    counts_ss = while_body_collective_counts(_compiled_hlo(sp.cg_single_sync))
    assert counts_ss.get("all-reduce") == 1, counts_ss
    counts_cg = while_body_collective_counts(_compiled_hlo(sp.cg))
    assert counts_cg.get("all-reduce", 0) >= 2, counts_cg


def test_distributed_iteration_invariance():
    """Same iteration count on 1 and 8 devices (reduction order aside)."""
    from sprsolve_tpu.parallel.dist_operator import partition_dia
    from sprsolve_tpu.parallel.solve import make_solver_specs

    A = problems.poisson3d(12, 12, 12, dtype=np.float64)  # SPD
    n = A.shape[0]
    rhs = np.random.default_rng(9).standard_normal(n)
    its = {}
    for nd in (1, 8):
        dia = A.to_dia()
        A_parts = partition_dia(dia, nd, "rows")
        mesh = jax.make_mesh((nd,), ("rows",), devices=jax.devices()[:nd])
        in_specs, out_specs = make_solver_specs(A_parts, None, "rows")

        def run(A_, b_, x_):
            return sp.cg_single_sync(A_, b_, x_, tol=1e-10, max_iter=500,
                                     axis_name="rows")

        sharded = jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))
        n_pad = A_parts.shape[0]
        b_p = jnp.zeros(n_pad, jnp.float64).at[:n].set(rhs)
        x, info = sharded(A_parts, b_p, jnp.zeros_like(b_p))
        assert int(info.status) == int(Status.CONVERGED)
        its[nd] = int(info.iterations)
        r = np.asarray(A.matvec(jnp.asarray(np.asarray(x)[:n]))) - rhs
        assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-9
    assert abs(its[1] - its[8]) <= 2, its
