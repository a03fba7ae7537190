"""Autotune round 2: block_rows beyond 128, lanes 1024 (after halo-rounding
fix), and the complex two-plane kernel block size.

Usage: python tools/tune_kernel2.py
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
    from bench import time_spmv
    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems

    log(f"device: {jax.devices()[0]}")
    A = problems.poisson3d(100, 100, 100, dtype=np.float32)
    dia = A.to_dia()
    nnz = A.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))

    best = (None, float("inf"))
    for lanes, block_rows in [
        (512, 128), (512, 256), (512, 512),
        (1024, 64), (1024, 128), (1024, 256),
        (256, 256), (256, 512),
    ]:
        try:
            p = PaddedDIA.from_dia(dia, lanes=lanes, block_rows=block_rows)
            x2 = jax.block_until_ready(p.pad_vec(x))
            t = time_spmv(lambda pp, vv: pp.matvec(vv), p, x2, iters=300)
            log(
                f"lanes={lanes:5d} block_rows={block_rows:4d}: "
                f"{t*1e3:.3f} ms  {nnz/t/1e9:6.1f} Gnnz/s"
            )
            if t < best[1]:
                best = ((lanes, block_rows), t)
        except Exception as e:
            log(f"lanes={lanes} block_rows={block_rows}: {type(e).__name__}: {str(e)[:90]}")
    (lanes, br), t = best
    log(f"BEST: lanes={lanes} block_rows={br} -> {nnz/t/1e9:.1f} Gnnz/s")


if __name__ == "__main__":
    main()
