"""s-step (communication-avoiding) BiCGStab.

Covers: serial iteration parity with plain bicgstab across bases and s,
nonsymmetric + skewed-spectrum + complex systems against dense oracles,
f32, the skew-symmetric breakdown exit, residual-history boundary,
input validation (2-D rhs, bad s/basis, matrix-powers depth = 2s), the
distributed_solve(mpk_s=2s) route with 1-vs-8 device invariance, and the
HLO certification of the headline claim — the inner while body spends
ONE all-reduce + TWO collective-permutes per s BiCGStab iterations
(plain bicgstab: ≥3 dependent all-reduce rounds + 4 permutes per single
iteration)."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import sprsolve_tpu as sp
from sprsolve_tpu.errors import SolveInfo, Status
from sprsolve_tpu.parallel import distributed_solve, partition_dia_mpk
from sprsolve_tpu.utils import problems
from sprsolve_tpu.utils.hlo import (
    body_computations,
    collective_summary,
    parse_computations,
)


def _spd_grid(side=32):
    A, _ = problems.sym_grid_laplacian((side, side))
    return dataclasses.replace(A, data=-A.data)  # positive definite


def _skewed_laplacian(amp, seed=7, shape=(24, 24)):
    """Laplacian + amp·(sparse random skew) — eigenvalues migrate off the
    real axis (same generator as tests/test_bicgstabl.py)."""
    A = problems.grid_laplacian_dirichlet(shape)
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    skew = np.triu(rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.01))
    skew = skew - skew.T
    dense = np.asarray(A.todense()) + amp * skew
    b = rng.standard_normal(n)
    return dense, b


@pytest.mark.parametrize(
    "basis,s", [("monomial", 1), ("monomial", 2),
                ("chebyshev", 2), ("chebyshev", 4)]
)
def test_serial_parity_with_bicgstab_spd(basis, s):
    A = _spd_grid(32)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(1024))
    _, info_ref = sp.bicgstab(A, b, tol=1e-10, max_iter=2000)
    x, info = sp.ca_bicgstab(
        A, b, s=s, basis=basis, bounds=sp.gershgorin_bounds(A),
        tol=1e-10, max_iter=2000,
    )
    info.raise_if_error()
    bn = np.asarray(b)
    tr = np.linalg.norm(np.asarray(A.matvec(x)) - bn) / np.linalg.norm(bn)
    assert tr <= 1e-10
    # same Krylov + MR iteration; the ω-step arithmetic differs in rounding
    # order so counts track plain bicgstab loosely (measured within ±3 at
    # this seed) — assert a generous envelope, not equality
    assert abs(int(info.iterations) - int(info_ref.iterations)) <= max(
        10, int(info_ref.iterations) // 5
    )


def test_nonsymmetric_dirichlet_matches_dense_solve():
    A = problems.grid_laplacian_dirichlet((20, 20))
    dense = np.asarray(A.todense())
    b = np.random.default_rng(5).standard_normal(400)
    x, info = sp.ca_bicgstab(
        A, jnp.asarray(b), s=2, bounds=sp.gershgorin_bounds(A),
        tol=1e-12, max_iter=3000,
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, b), atol=1e-9
    )


def test_skewed_spectrum_converges():
    dense, b = _skewed_laplacian(0.3)
    A = sp.csr_from_dense(dense)
    x, info = sp.ca_bicgstab(
        A, jnp.asarray(b), s=2, bounds=sp.gershgorin_bounds(A),
        tol=1e-10, max_iter=6000,
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, b), atol=1e-6
    )


def test_wrong_bounds_never_returns_poisoned_x():
    """Chebyshev bounds that MISS the spectrum make the basis grow like
    cosh(2s·dist) — the block-divergence rollback must discard exploded
    blocks and re-anchor, so the returned x is always the honestly-reported
    iterate (found live: without the rollback this returned res 3e33 with
    status INSUFFICIENT_ITER and a poisoned x)."""
    A = problems.grid_laplacian_dirichlet((20, 20))  # spectrum ⊂ (−8, 1)
    rhs = np.zeros(400)
    problems.set_boundary_condition(rhs, (20, 20), lambda r, c: float(r + c))
    x, info = sp.ca_bicgstab(
        A, jnp.asarray(rhs), s=2, bounds=(0.0, 9.0),  # wrong on purpose
        tol=1e-10, max_iter=2000,
    )
    tr = np.linalg.norm(np.asarray(A.matvec(x)) - rhs) / np.linalg.norm(rhs)
    # reported residual is the measured one, and x is never garbage
    np.testing.assert_allclose(float(info.residual), tr, rtol=1e-6)
    assert tr < 1.0
    if int(info.status) == int(Status.CONVERGED):
        assert tr <= 1e-10


def test_complex_nonsymmetric():
    rng = np.random.default_rng(11)
    n = 96
    dense = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    dense *= rng.random((n, n)) < 0.12
    dense += np.eye(n) * (6.0 + 2.0j)  # diagonally dominant
    A = sp.csr_from_dense(dense)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x, info = sp.ca_bicgstab(
        A, jnp.asarray(b), s=2, tol=1e-11, max_iter=1000,
    )
    info.raise_if_error()
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(dense, b), atol=1e-8
    )


def test_f32():
    A64 = _spd_grid(32)
    A32 = dataclasses.replace(A64, data=A64.data.astype(jnp.float32))
    b = jnp.asarray(
        np.random.default_rng(7).standard_normal(1024), jnp.float32
    )
    x, info = sp.ca_bicgstab(A32, b, s=2, bounds=(0.0, 8.0), tol=1e-4,
                             max_iter=2000)
    info.raise_if_error()
    assert x.dtype == jnp.float32
    r = np.asarray(A32.matvec(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-4


def test_breakdown_on_skew_symmetric():
    # nonsingular skew-symmetric A: with x0 = 0 the first shadow dot is
    # ⟨r̃₀, A·r̃₀⟩ = 0 for real vectors → the reference's BreakDown exit
    # (src/bicg_stab.rs:164-167)
    n = 64
    blocks = [np.array([[0.0, 1.0], [-1.0, 0.0]])] * (n // 2)
    from scipy.linalg import block_diag

    A = sp.csr_from_dense(block_diag(*blocks))
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    _, info = sp.ca_bicgstab(A, b, s=2, tol=1e-10, max_iter=100)
    assert int(info.status) == int(Status.BREAKDOWN)


def test_residual_history_boundary():
    A = _spd_grid(32)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(1024))
    x, info, hist = sp.ca_bicgstab(
        A, b, s=2, bounds=(0.0, 8.0), tol=1e-10, max_iter=2000,
        record_residuals=True,
    )
    info.raise_if_error()
    assert hist.shape == (2001,)
    its = int(info.iterations)
    vals = np.asarray(hist)
    assert np.isfinite(vals[: its - 1]).all()  # its includes the +1 anchor
    assert np.isnan(vals[its + 1:]).all()


def test_zero_rhs_and_warm_start():
    A = _spd_grid(16)
    x, info = sp.ca_bicgstab(A, jnp.zeros(256), s=2, tol=1e-10, max_iter=50)
    assert int(info.status) == int(Status.CONVERGED)
    assert int(info.iterations) == 0
    np.testing.assert_array_equal(np.asarray(x), 0.0)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(256))
    x1, _ = sp.ca_bicgstab(A, b, s=2, tol=1e-12, max_iter=500)
    _, info_w = sp.ca_bicgstab(A, b, x1, s=2, tol=1e-10, max_iter=50)
    assert int(info_w.status) == int(Status.CONVERGED)
    assert int(info_w.iterations) <= 2  # at most the anchor


def test_input_validation():
    from sprsolve_tpu.errors import IncompatibleMatrixFormat

    A = _spd_grid(16)
    with pytest.raises(IncompatibleMatrixFormat):
        sp.ca_bicgstab(A, jnp.zeros((16, 16)), s=2, tol=1e-6, max_iter=10)
    with pytest.raises(ValueError, match="s >= 1"):
        sp.ca_bicgstab(A, jnp.zeros(256), s=0, tol=1e-6, max_iter=10)
    with pytest.raises(ValueError, match="bounds"):
        sp.ca_bicgstab(A, jnp.zeros(256), s=2, basis="chebyshev",
                       tol=1e-6, max_iter=10)
    with pytest.raises(ValueError, match="unknown basis"):
        sp.ca_bicgstab(A, jnp.zeros(256), s=2, basis="legendre",
                       tol=1e-6, max_iter=10)


def test_s_exceeding_mpk_depth_raises():
    A = _spd_grid(32)
    parts = partition_dia_mpk(A.to_dia(), 8, 2)  # depth 2 < 2s = 4
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    b = jnp.zeros(1024)
    with pytest.raises(ValueError, match="matrix-powers depth"):
        jax.shard_map(
            lambda op, b_: sp.ca_bicgstab(op, b_, s=2, tol=1e-6,
                                          max_iter=10, axis_name="rows"),
            mesh=mesh,
            in_specs=(parts.pspec("rows"), P("rows")),
            out_specs=(P("rows"), SolveInfo(P(), P(), P())),
            check_vma=False,
        )(parts, b)


def test_distributed_matches_serial():
    A = _spd_grid(32)
    n = 1024
    rng = np.random.default_rng(9)
    b = rng.standard_normal(n)
    bounds = sp.gershgorin_bounds(A)
    solver = partial(sp.ca_bicgstab, s=2, bounds=bounds)
    its = {}
    for nd in (1, 8):
        mesh = jax.make_mesh(
            (nd,), ("rows",), devices=jax.devices()[:nd],
            axis_types=(jax.sharding.AxisType.Auto,),
        )
        x, info = distributed_solve(
            solver, A.to_dia(), b, mesh=mesh, tol=1e-10, max_iter=2000,
            mpk_s=4,  # depth 2s
        )
        assert int(info.status) == int(Status.CONVERGED)
        its[nd] = int(info.iterations)
        r = np.asarray(A.matvec(jnp.asarray(np.asarray(x)[:n]))) - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-9
    # the Gram psum changes reduction order across device counts; the MR
    # ω-steps amplify that more than CG's — allow a small count drift
    assert abs(its[1] - its[8]) <= 6, its


def _compiled_hlo(s):
    A = _spd_grid(32)
    parts = partition_dia_mpk(A.to_dia(), 8, 2 * s)
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    b = jnp.asarray(np.random.default_rng(0).standard_normal(1024))

    def run(op, b_, x_):
        return sp.ca_bicgstab(op, b_, x_, s=s, basis="chebyshev",
                              bounds=(0.0, 8.0), tol=1e-10, max_iter=2000,
                              axis_name="rows")

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(parts.pspec("rows"), P("rows"), P("rows")),
        out_specs=(P("rows"), SolveInfo(P(), P(), P())),
        check_vma=False,
    ))
    return fn.lower(parts, b, jnp.zeros(1024)).compile().as_text()


def test_hlo_one_allreduce_per_block():
    """THE claim: the inner while body — one pass = s BiCGStab iterations —
    contains exactly 1 all-reduce (the fused (4s+1)×(4s+2) Gram/shadow
    projection) and 2 collective-permutes (the single depth-2s·h
    exchange)."""
    s = 2
    hlo = _compiled_hlo(s)
    bodies = body_computations(hlo)
    comps = parse_computations(hlo)
    summary = collective_summary(hlo)
    inner = {
        bn for bn in bodies
        if any(
            f"body={bn}" in ln or f"body=%{bn}" in ln
            for other in bodies if other != bn
            for ln in comps.get(other, [])
        )
    }
    assert len(inner) == 1, (bodies, inner)
    counts = {k: v[0] for k, v in summary[inner.pop()].items()}
    assert counts == {"all-reduce": 1, "collective-permute": 2}, counts
