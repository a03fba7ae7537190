"""On-chip A/B: multigrid V-cycle levels on XLA-DIA vs Pallas kernels.

BENCH_NOTES records the MG crossover line at 2,432 µs per BiCGStab
iteration with XLA-DIA level operators (the `from_csr` default).  The
level-0 smoother SpMVs dominate that cost, and the Pallas kernel runs the
same SpMV ~12× faster; this probe measures whether
`GridMGPrecond.from_csr(..., prefer_pallas=True)` (FlatViewOperator
round-trips per apply) pays off end-to-end on the 1M-row Poisson at
tol 1e-6.

Run on the real chip: python tools/probe_mg_pallas.py

MEASURED OUTCOME (v5e, back-to-back): xla-dia levels 2,406 µs/iter,
pallas levels 2,685 µs/iter — the kernel path is ~12% SLOWER end-to-end.
The V-cycle's cost is not the level-0 SpMV throughput: the weighted-Jacobi
smoother's elementwise passes (residual, D⁻¹ scale, correction) fuse INTO
the XLA DIA matvec's fusion soup, while the Pallas path breaks that fusion
at the kernel boundary and adds the FlatViewOperator pad/unpad round-trip
per apply.  `from_csr`'s `prefer_pallas=False` default stands (negative
result, kept in the house tradition of recording them).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench as B


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import sprsolve_tpu as sp
    from sprsolve_tpu import GridMGPrecond
    from sprsolve_tpu.utils import problems

    n_side = 100
    A = problems.poisson3d(n_side, n_side, n_side, dtype=np.float32)
    dia = A.to_dia()
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    tight = 1e-6

    for label, kwargs in (
        ("xla-dia levels", {}),
        ("pallas levels", {"prefer_pallas": True}),
    ):
        t0 = time.perf_counter()
        M = GridMGPrecond.from_csr(A, (n_side,) * 3, **kwargs)
        B.log(f"{label}: hierarchy built in {time.perf_counter()-t0:.1f}s")

        def build(mi, tol):
            return jax.jit(
                lambda: sp.bicgstab(dia, rhs, M=M, tol=tol, max_iter=mi)
            )

        _, info = build(200, tight)()
        t_it = B.time_solve_periter(lambda mi: build(mi, 0.0), iters_forced=60)
        B.solve_report(f"bicgstab+mg ({label}) 1M tol {tight:g}", info,
                       tight, t_it)


if __name__ == "__main__":
    main()
