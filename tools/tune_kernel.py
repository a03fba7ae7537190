"""Offline kernel autotune: sweep PaddedDIA (block_rows, lanes) on the real
chip and report the best configuration — the analog of MKL's hint+optimize
calibration (``src/mkl_mat.rs:81-148``), run once per chip generation.

Usage: python tools/tune_kernel.py   (needs the TPU; takes a few minutes)
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
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
    for lanes in (256, 512, 1024):
        for block_rows in (8, 16, 32, 64, 128):
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
                log(f"lanes={lanes} block_rows={block_rows}: {type(e).__name__}: {e}")
    (lanes, br), t = best
    log(f"BEST: lanes={lanes} block_rows={br} -> {nnz/t/1e9:.1f} Gnnz/s")


if __name__ == "__main__":
    main()
