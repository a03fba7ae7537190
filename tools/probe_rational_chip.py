"""On-chip probe: rational filter at the 262k interior-eigen workload.

Iterates bench parameters without paying the full bench run: k=4 nearest
sigma=1.0 on poisson3d(64) f32 — the exact shift-invert comparison case
(BENCH_NOTES Eigen).  Run: python tools/probe_rational_chip.py [inner_max]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sprsolve_tpu as sp
    from sprsolve_tpu.errors import Status
    from sprsolve_tpu.utils import problems

    inner_max = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print("device:", jax.devices()[0], "inner_max:", inner_max)
    A = problems.poisson3d(64, 64, 64, dtype=np.float32)

    import jax as _jax
    _jax.config.update("jax_enable_x64", True)

    def run():
        return sp.rational_filter_eigs(
            A, 4, 1.0, tol=5e-4, inner_tol=1e-2,
            inner_max_iter=inner_max, m0=8, n_quad=4,
            inner_refine=3, seed=0,
        )

    t0 = time.perf_counter()
    lam, X, info = run()
    jax.block_until_ready(lam)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    lam, X, info = run()
    jax.block_until_ready(lam)
    t_run = time.perf_counter() - t0
    print(f"status {Status(int(info.status)).name}, inner iters "
          f"{int(info.iterations)}, worst rel-res {float(info.residual):.2e}")
    print(f"compile {t_cold - t_run:.1f}s + run {t_run:.1f}s")
    print("lam:", np.asarray(lam))


if __name__ == "__main__":
    main()
