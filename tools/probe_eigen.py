"""Probe: make the eigen bench lines converge on chip (VERDICT r4 follow-up).

Round-4 first run showed honest INSUFFICIENT_ITER on both eigen lines:
- LOBPCG smallest-4 at 1M rows: the lowest Poisson eigenvalues cluster at
  ~(pi/101)^2 — unpreconditioned convergence is gap-limited. Hypothesis:
  M = GridMGPrecond (~A^-1) restores fast convergence (the classic
  preconditioned-LOBPCG setup).
- shift-invert at 262k: the inner MINRES hits its 200-iteration cap, so
  the inverse is applied too loosely. Hypothesis: larger inner budget +
  slightly looser outer tol converge within a sane budget.

Run on the TPU chip: python tools/probe_eigen.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import sprsolve_tpu as sp
    from sprsolve_tpu.errors import Status
    from sprsolve_tpu.solvers import lobpcg, shift_invert_eigs
    from sprsolve_tpu.utils import problems

    rng = np.random.default_rng(0)

    # --- A: MG-preconditioned LOBPCG at 1M rows
    n_side = 100
    A = problems.poisson3d(n_side, n_side, n_side, dtype=np.float32)
    n = A.shape[0]
    dia = A.to_dia()
    t0 = time.perf_counter()
    M_mg = sp.GridMGPrecond.from_csr(A, (n_side, n_side, n_side))
    print(f"MG setup: {time.perf_counter()-t0:.2f}s", flush=True)

    X0 = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    for label, M_e, mi in (("unprec", None, 80), ("MG", M_mg, 60)):
        run = jax.jit(lambda a, x0, M_=M_e, mi_=mi: lobpcg(
            a, x0, M=M_, tol=5e-4, max_iter=mi_))
        t0 = time.perf_counter()
        lam, _, info = run(dia, X0)
        jax.block_until_ready(lam)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        lam, _, info = run(dia, X0)
        float(lam[0])
        t = time.perf_counter() - t0
        it = max(int(info.iterations), 1)
        print(f"lobpcg 1M k=4 {label}: {Status(int(info.status)).name} "
              f"{it} iters res {float(info.residual):.2e} "
              f"{t:.2f}s ({t/it*1e3:.1f} ms/iter, first {t_first:.1f}s) "
              f"lam0={float(lam[0]):.3e}", flush=True)

    # --- B: shift-invert budgets at 262k
    A_si = problems.poisson3d(64, 64, 64, dtype=np.float32)
    for tol, imi, mi in ((5e-4, 600, 60), (2e-3, 400, 40)):
        t0 = time.perf_counter()
        lam, _, info = shift_invert_eigs(
            A_si, 4, 1.0, tol=tol, max_iter=mi, inner_max_iter=imi,
        )
        jax.block_until_ready(lam)
        t = time.perf_counter() - t0
        print(f"shift-invert 262k tol={tol} inner={imi} max={mi}: "
              f"{Status(int(info.status)).name} {int(info.iterations)} iters "
              f"res {float(info.residual):.2e} {t:.1f}s "
              f"lam near 1.0: {np.round(np.asarray(lam), 4)}", flush=True)


if __name__ == "__main__":
    main()
