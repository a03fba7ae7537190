"""s-step (communication-avoiding) CG and the matrix-powers kernel.

Covers: MPK power-chain exactness vs repeated SpMV, serial iteration
parity with plain cg across bases and s, complex-HPD support, f32,
breakdown on indefinite systems, residual-history boundary, the
distributed_solve(mpk_s=...) route with 1-vs-8 device invariance, and the
HLO certification of the headline claim — the inner while body spends
ONE all-reduce + TWO collective-permutes per s iterations (plain cg:
2 all-reduces + 2 permutes per single iteration)."""

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


def test_mpk_powers_exact():
    A = _spd_grid(32)
    dia = A.to_dia()
    s = 3
    parts = partition_dia_mpk(dia, 8, s)
    assert parts.ext == s * parts.halo and parts.max_power == s
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    v = np.random.default_rng(0).standard_normal(1024)

    def run(op, x):
        cur = op.mpk_extend(jnp.stack([x, 2 * x], axis=1))
        outs = []
        for _ in range(s):
            cur = op.mpk_apply(cur)
            outs.append(op.mpk_central(cur))
        return tuple(outs)

    outs = jax.shard_map(
        run, mesh=mesh, in_specs=(parts.pspec("rows"), P("rows")),
        out_specs=tuple(P("rows", None) for _ in range(s)),
    )(parts, jnp.asarray(v))
    want = v.copy()
    for j in range(s):
        want = np.asarray(A.matvec(jnp.asarray(want)))
        np.testing.assert_allclose(
            np.asarray(outs[j])[:, 0], want, rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(outs[j])[:, 1], 2 * want, rtol=1e-12, atol=1e-12
        )


def test_mpk_matvec_view_matches():
    A = _spd_grid(32)
    parts = partition_dia_mpk(A.to_dia(), 8, 2)
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    v = np.random.default_rng(1).standard_normal(1024)
    y = jax.shard_map(
        lambda op, x: op.matvec(x), mesh=mesh,
        in_specs=(parts.pspec("rows"), P("rows")), out_specs=P("rows"),
    )(parts, jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.matvec(jnp.asarray(v))), atol=1e-13
    )


def test_mpk_depth_limit_raises():
    A = _spd_grid(16)  # 256 rows, halo 16, 32 rows/device on 8
    with pytest.raises(ValueError, match="rows-per-device"):
        partition_dia_mpk(A.to_dia(), 8, 3)  # ext 48 > 32


@pytest.mark.parametrize(
    "basis,s", [("monomial", 2), ("monomial", 4),
                ("chebyshev", 4), ("chebyshev", 8)]
)
def test_serial_parity_with_cg(basis, s):
    A = _spd_grid(32)
    n = 1024
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    _, info_cg = sp.cg(A, b, tol=1e-10, max_iter=2000)
    x, info = sp.ca_cg(
        A, b, s=s, basis=basis, bounds=sp.gershgorin_bounds(A),
        tol=1e-10, max_iter=2000,
    )
    info.raise_if_error()
    bn = np.asarray(b)
    tr = np.linalg.norm(
        np.asarray(A.matvec(jnp.asarray(np.asarray(x)))) - bn
    ) / np.linalg.norm(bn)
    assert tr <= 1e-10
    # same Krylov iteration — counts match plain cg up to the +1 the outer
    # true-residual anchor charges (and one spare for rounding-order noise)
    assert abs(int(info.iterations) - int(info_cg.iterations)) <= 2


def test_complex_hpd():
    A, _ = problems.hermitian_grid((8, 8))
    # −A is indefinite (λ ∈ [−5.3, 18.3]); shift to HPD
    dense = -np.asarray(A.todense()) + 6.0 * np.eye(64)
    Apos = sp.csr_from_dense(dense)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(64) + 1j * rng.standard_normal(64))
    lo, hi = sp.gershgorin_bounds(Apos)
    x, info = sp.ca_cg(
        Apos, b, s=4, bounds=(lo, hi), tol=1e-11, max_iter=600
    )
    info.raise_if_error()
    r = dense @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-11


def test_f32():
    A32 = dataclasses.replace(
        _spd_grid(32), data=-(-_spd_grid(32).data).astype(jnp.float32)
    )
    b = jnp.asarray(
        np.random.default_rng(7).standard_normal(1024), jnp.float32
    )
    x, info = sp.ca_cg(A32, b, s=4, bounds=(0.0, 8.0), tol=1e-4,
                       max_iter=2000)
    info.raise_if_error()
    assert x.dtype == jnp.float32
    r = np.asarray(A32.matvec(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) <= 1e-4


def test_breakdown_on_indefinite():
    # MINRES's folded Laplacian is negative definite → pᴴAp < 0 on step 1
    A, rhs = problems.sym_grid_laplacian((8, 8))
    _, info = sp.ca_cg(A, jnp.asarray(rhs), s=4, tol=1e-10, max_iter=100)
    assert int(info.status) == int(Status.BREAKDOWN)


def test_residual_history_boundary():
    A = _spd_grid(32)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(1024))
    x, info, hist = sp.ca_cg(
        A, b, s=4, bounds=(0.0, 8.0), tol=1e-10, max_iter=2000,
        record_residuals=True,
    )
    info.raise_if_error()
    assert hist.shape == (2001,)
    its = int(info.iterations)
    vals = np.asarray(hist)
    assert np.isfinite(vals[: its - 1]).all()  # its includes the +1 anchor
    assert np.isnan(vals[its + 1:]).all()


def test_rejects_2d_rhs():
    from sprsolve_tpu.errors import IncompatibleMatrixFormat

    A = _spd_grid(32)
    with pytest.raises(IncompatibleMatrixFormat):
        sp.ca_cg(A, jnp.zeros((128, 128)), s=2, tol=1e-6, max_iter=10)


def test_s_exceeding_mpk_depth_raises():
    A = _spd_grid(32)
    parts = partition_dia_mpk(A.to_dia(), 8, 2)
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    b = jnp.zeros(1024)
    with pytest.raises(ValueError, match="matrix-powers depth"):
        jax.shard_map(
            lambda op, b_: sp.ca_cg(op, b_, s=4, tol=1e-6, max_iter=10,
                                    axis_name="rows"),
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
    solver = partial(sp.ca_cg, s=4, bounds=bounds)
    its = {}
    for nd in (1, 8):
        mesh = jax.make_mesh(
            (nd,), ("rows",), devices=jax.devices()[:nd],
            axis_types=(jax.sharding.AxisType.Auto,),
        )
        x, info = distributed_solve(
            solver, A.to_dia(), b, mesh=mesh, tol=1e-10, max_iter=2000,
            mpk_s=4,
        )
        assert int(info.status) == int(Status.CONVERGED)
        its[nd] = int(info.iterations)
        r = np.asarray(A.matvec(jnp.asarray(np.asarray(x)[:n]))) - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-9
    assert abs(its[1] - its[8]) <= 2, its


def test_csr_mpk_partition_raises():
    A = _spd_grid(32)
    with pytest.raises(TypeError, match="DIA"):
        distributed_solve(
            partial(sp.ca_cg, s=2), A, np.ones(1024), tol=1e-6,
            max_iter=10, mpk_s=2,
        )


def _compiled_hlo(s):
    A = _spd_grid(32)
    parts = partition_dia_mpk(A.to_dia(), 8, s)
    mesh = jax.make_mesh(
        (8,), ("rows",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    b = jnp.asarray(np.random.default_rng(0).standard_normal(1024))

    def run(op, b_, x_):
        return sp.ca_cg(op, b_, x_, s=s, basis="chebyshev",
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
    """THE claim: the inner while body — one pass = s CG iterations —
    contains exactly 1 all-reduce (the (2s+1)² Gram) and 2
    collective-permutes (the single depth-s·h exchange)."""
    s = 4
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


def test_jacobi_folding_matches_preconditioned_cg():
    """VERDICT r4 #8: ca_cg(M='jacobi') via operator folding.

    On an SPD system with a wildly varying diagonal, unpreconditioned CG
    needs many iterations and Jacobi collapses the count.  fold_jacobi
    (symmetric diagonal scaling) must reproduce Jacobi-CG's convergence
    through the solve() surface: iteration count within the s-step anchor
    slack of cg(M=jacobi), and the returned x solves the ORIGINAL system.
    """
    import scipy.sparse as sps

    side = 32
    n = side * side
    A = _spd_grid(side)
    # rescale rows/cols by 4 decades: D^{1/2} L D^{1/2} keeps SPD
    scale = np.logspace(0, 4, n)[
        np.random.default_rng(0).permutation(n)
    ]
    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    D = sps.diags(np.sqrt(scale))
    S2 = (D @ S @ D).tocsr()
    A2 = sp.csr_from_scipy(S2)
    b = np.random.default_rng(3).standard_normal(n)

    from sprsolve_tpu.precond import DiagPrecond

    _, info_pcg = sp.cg(
        A2, jnp.asarray(b), M=DiagPrecond.new(A2.diagonal()),
        tol=1e-10, max_iter=4000,
    )
    x_fold, info_fold = sp.solve(
        A2, b, method="ca_cg", M="jacobi", s=4, tol=1e-10, max_iter=4000
    )
    info_fold.raise_if_error()
    x_plain, info_plain = sp.solve(
        A2, b, method="ca_cg", s=4, tol=1e-10, max_iter=4000
    )

    # tol applies in the SCALED (preconditioned-residual) norm — the
    # PETSc-style left-preconditioned criterion documented on fold_jacobi
    d = S2.diagonal()
    r = S2 @ np.asarray(x_fold) - b
    r_scaled = r / np.sqrt(d)
    b_scaled = b / np.sqrt(d)
    assert np.linalg.norm(r_scaled) / np.linalg.norm(b_scaled) <= 1e-10
    # ...which still pins the original-system residual to within ~κ(D)^½
    assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-7
    # folded == Jacobi-CG convergence (same Krylov space in the D-inner
    # product), up to the outer anchors' +1s and reduction-order noise
    assert abs(int(info_fold.iterations) - int(info_pcg.iterations)) <= 6
    # and the fold genuinely preconditions: the unscaled run is far slower
    assert int(info_fold.iterations) < int(info_plain.iterations) * 0.6


def test_solve_routes_ca_methods_with_default_bounds():
    """solve(method='ca_cg'/'ca_bicgstab') works with no bounds given
    (Gershgorin default → Chebyshev basis)."""
    A = _spd_grid(16)
    b = np.random.default_rng(1).standard_normal(256)
    x, info = sp.solve(A, b, method="ca_cg", tol=1e-10, max_iter=1000)
    info.raise_if_error()
    r = np.asarray(A.matvec(jnp.asarray(np.asarray(x)))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) <= 1e-10
