"""Per-iteration communication volume of the distributed solvers, certified
against the compiled HLO (the measurable multi-chip proxy available without
pod hardware — SURVEY.md §5, BASELINE config #5).
"""

import jax
import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.parallel.dist_operator import partition_dia
from sprsolve_tpu.parallel.solve import make_solver_specs
from sprsolve_tpu.utils import problems
from sprsolve_tpu.utils.hlo import (
    body_computations,
    collective_summary,
    independent_of_permutes,
    parse_computations,
    while_body_collective_bytes,
)


def _compiled_bicgstab_hlo(nd=8, side=24):
    A = problems.grid_laplacian_dirichlet((side, side), dtype=np.float32)
    dia = A.to_dia()
    A_parts = partition_dia(dia, nd, "rows")
    mesh = jax.make_mesh((nd,), ("rows",), devices=jax.devices()[:nd])
    in_specs, out_specs = make_solver_specs(A_parts, None, "rows")

    def run(A_, b_, x_):
        return sp.bicgstab(A_, b_, x_, tol=1e-6, max_iter=200,
                           axis_name="rows")

    sharded = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))
    n_pad = A_parts.shape[0]
    b = jnp.zeros(n_pad, jnp.float32)
    x0 = jnp.zeros(n_pad, jnp.float32)
    hlo = sharded.lower(A_parts, b, x0).compile().as_text()
    h = max(abs(o) for o in dia.offsets)
    return hlo, h


def test_per_iteration_halo_bytes_match_analytic():
    """Per BiCGStab iteration: exactly 2 matvecs × 2 ppermutes × h × 4 B of
    halo traffic per device (HLO ground truth == analytic model), plus only
    scalar-sized all-reduces (the fused psum of the iteration's dots)."""
    hlo, h = _compiled_bicgstab_hlo()
    per_iter = while_body_collective_bytes(hlo)
    assert per_iter.get("collective-permute") == 2 * 2 * h * 4, per_iter
    # the dots reduce to a handful of scalars — never vector-sized traffic
    assert per_iter.get("all-reduce", 0) <= 64, per_iter
    assert "all-gather" not in per_iter, per_iter


def test_halo_exchange_leaves_overlap_room():
    """The while body must keep a nonempty set of instructions with no data
    dependence on the collective-permutes — the local interior work XLA's
    latency-hiding scheduler can overlap with the halo exchange (the
    ring-attention-style overlap of BASELINE config #5)."""
    hlo, _ = _compiled_bicgstab_hlo()
    comps = parse_computations(hlo)
    bodies = [b for b in body_computations(hlo) if b in comps]
    assert bodies
    # the iteration body is the one containing the permutes
    permute_bodies = [
        b for b in bodies
        if "collective-permute" in collective_summary(hlo).get(b, {})
    ]
    assert permute_bodies, "no while body contains the halo exchange"
    for b in permute_bodies:
        n_total, n_indep = independent_of_permutes(comps[b])
        assert n_indep >= 10, (b, n_indep, n_total)


def test_iteration_count_invariance_across_device_counts():
    """Row-partitioning must not change convergence behavior beyond the
    psum reduction-order effect: counts within a few iterations of each
    other across 1/2/4/8 devices, residuals all converged."""
    from sprsolve_tpu.parallel import distributed_solve

    A = problems.poisson3d(16, 16, 16, dtype=np.float32)
    dia = A.to_dia()
    rhs = np.random.default_rng(0).standard_normal(A.shape[0]).astype(np.float32)
    M = sp.DiagPrecond.new(np.asarray(dia.diagonal()))
    counts = {}
    for nd in (1, 2, 4, 8):
        mesh = jax.make_mesh((nd,), ("rows",), devices=jax.devices()[:nd])
        x, info = distributed_solve(
            sp.bicgstab, dia, jnp.asarray(rhs), M=M, tol=1e-5, max_iter=300,
            mesh=mesh,
        )
        info.raise_if_error()
        r = np.asarray(A.matvec(jnp.asarray(np.asarray(x)))) - rhs
        assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-4
        counts[nd] = int(info.iterations)
    spread = max(counts.values()) - min(counts.values())
    assert spread <= max(3, min(counts.values()) // 10), counts
