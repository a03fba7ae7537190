"""Autotune round 3: extend the (lanes, block_rows) frontier past 512 and
check the winning config end-to-end (BiCGStab + MINRES per-iteration cost,
where grid granularity interacts with the fused-dot epilogues).

Usage: python tools/tune_kernel3.py
"""

import sys
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import time_spmv, time_solve_periter
    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems
    import sprsolve_tpu as sp

    log(f"device: {jax.devices()[0]}")
    A = problems.poisson3d(100, 100, 100, dtype=np.float32)
    dia = A.to_dia()
    nnz = A.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))

    for lanes, block_rows in [
        (512, 512), (512, 640), (512, 768), (512, 1024),
        (1024, 256), (1024, 512), (256, 1024),
    ]:
        try:
            p = PaddedDIA.from_dia(dia, lanes=lanes, block_rows=block_rows)
            x2 = jax.block_until_ready(p.pad_vec(x))
            t = time_spmv(lambda pp, vv: pp.matvec(vv), p, x2, iters=300)
            log(
                f"lanes={lanes:5d} block_rows={block_rows:4d}: "
                f"{t*1e3:.3f} ms  {nnz/t/1e9:6.1f} Gnnz/s"
            )
        except Exception as e:
            log(f"lanes={lanes} block_rows={block_rows}: {type(e).__name__}: {str(e)[:90]}")

    b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    for lanes, block_rows in [(256, 256), (512, 512)]:
        p = PaddedDIA.from_dia(dia, lanes=lanes, block_rows=block_rows)
        b2 = p.pad_vec(b)
        M = p.jacobi_precond()

        def build_bicg(mi):
            def run():
                xx, info = sp.bicgstab(p, b2, M=M, tol=0.0, max_iter=mi)
                return info.residual
            return run

        def build_minres(mi):
            def run():
                xx, info = sp.minres(p, b2, tol=0.0, max_iter=mi)
                return info.residual
            return run

        t_b = time_solve_periter(build_bicg, iters_forced=600)
        t_m = time_solve_periter(build_minres, iters_forced=600)
        log(
            f"e2e lanes={lanes} br={block_rows}: bicgstab {t_b*1e6:.0f} us/iter, "
            f"minres {t_m*1e6:.0f} us/iter"
        )


if __name__ == "__main__":
    main()
