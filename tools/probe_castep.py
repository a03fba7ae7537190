"""Probe: single-chip wall cost of the s-step (CA) solvers.

The CA family's win is mesh latency (fewer reduction rounds / halo
exchanges per iteration); on ONE chip there is no latency to avoid and
the basis construction does ~2x the SpMV work of the plain iterations
(ca_cg: s applications of a 2-column block per s iterations = 2 SpMV-eq
per iteration vs plain CG's 1; ca_bicgstab: 2s applications of the
2-column block per s iterations = 4 vs plain BiCGStab's 2).  This probe
measures what that costs in practice at 1M rows so BENCH_NOTES can state
the single-chip price next to the HLO-certified communication claim.

Run on the TPU chip: python tools/probe_castep.py
"""

import sys
import time

import numpy as np


def bench_solver(name, fn, *args, reps=3):
    import jax

    t0 = time.perf_counter()
    x, info = fn(*args)
    jax.block_until_ready(x)
    t_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x, info = fn(*args)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - t0)
    its = int(info.iterations)
    res = float(info.residual)
    st = int(info.status)
    print(
        f"{name:22s} its={its:5d} res={res:.3e} status={st} "
        f"t={best*1e3:8.2f} ms  {best/max(its,1)*1e6:7.1f} us/iter "
        f"(first {t_first:.1f}s)",
        flush=True,
    )
    return best, its


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import sprsolve_tpu as sp
    from sprsolve_tpu.utils import problems

    print("devices:", jax.devices(), flush=True)
    n_side = 100
    t0 = time.perf_counter()
    A = problems.poisson3d(n_side, n_side, n_side, dtype=np.float32)
    n = A.shape[0]
    dia = A.to_dia()
    bounds = sp.gershgorin_bounds(dia)
    print(f"poisson3d {n} rows, built {time.perf_counter()-t0:.1f}s, "
          f"gershgorin {bounds}", flush=True)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    from functools import partial

    tol, mi = 1e-4, 3000
    runs = [
        ("cg", jax.jit(partial(sp.cg, tol=tol, max_iter=mi))),
        ("cg_single_sync",
         jax.jit(partial(sp.cg_single_sync, tol=tol, max_iter=mi))),
        ("ca_cg s=4",
         jax.jit(partial(sp.ca_cg, s=4, bounds=bounds, tol=tol,
                         max_iter=mi))),
        ("bicgstab", jax.jit(partial(sp.bicgstab, tol=tol, max_iter=mi))),
        ("bicgstabl l=2",
         jax.jit(partial(sp.bicgstabl, l=2, tol=tol, max_iter=mi))),
        ("ca_bicgstab s=2",
         jax.jit(partial(sp.ca_bicgstab, s=2, bounds=bounds, tol=tol,
                         max_iter=mi))),
        ("ca_bicgstab s=4",
         jax.jit(partial(sp.ca_bicgstab, s=4, bounds=bounds, tol=tol,
                         max_iter=mi))),
    ]
    for name, fn in runs:
        try:
            bench_solver(name, fn, dia, b)
        except Exception as e:  # noqa: BLE001 - probe keeps going
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
