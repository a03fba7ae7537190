"""Diagnose the round-4 flagship SpMV band: stale autotune cache or tenancy?

VERDICT r4 weak #3: the driver's capture showed 319.5 Gnnz/s vs round-3's
348.8 (−8%).  BENCH_NOTES asserted the documented ±5-10% tenancy band, but
the persisted autotune cache left a stale pinned block geometry as an
unexamined alternative.  This probe settles it on the real chip:

  1. DEFAULT geometry (no cache — the from_dia shipped defaults), measured
     3× back-to-back → run-to-run spread = the tenancy component.
  2. FRESH autotune sweep into a temp cache → winner geometry + its rate.
  3. WARM cache re-build (from_dia consults the winner) → confirms the
     cache path reproduces the tuned rate.

If (1) ≈ (2) ≈ (3) within the spread, geometry is not the variable and the
band is tenancy.  If (2) ≫ (1), a stale/missing cache costs real
throughput and bench.py must re-tune per round.

Run on the real TPU:  python tools/probe_band.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems
    from sprsolve_tpu.utils import tuning

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import time_spmv

    print("device:", jax.devices()[0])
    A = problems.poisson3d(100, 100, 100, dtype=np.float32)
    n, nnz = A.shape[0], A.nnz
    dia = A.to_dia()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

    def rate(t):
        return nnz / t / 1e9

    def measure(op, label, reps=3):
        x2 = jax.block_until_ready(op.pad_vec(x))
        rates = []
        for i in range(reps):
            t = time_spmv(lambda p, v: p.matvec(v), op, x2, iters=2000)
            rates.append(rate(t))
            print(f"  {label} rep {i}: {rates[-1]:.1f} Gnnz/s "
                  f"(lanes={op.lanes}, block_rows={op.block_rows})")
        return rates

    # 1. shipped defaults, no cache consulted (point at an empty temp file)
    with tempfile.TemporaryDirectory() as td:
        os.environ["SPRSOLVE_TUNE_CACHE"] = os.path.join(td, "tune.json")

        op_default = PaddedDIA.from_dia(dia)
        r_default = measure(op_default, "default-geometry")

        # 2. fresh autotune sweep (persists winner into the temp cache)
        t0 = time.perf_counter()
        op_tuned = tuning.tune_padded_dia(dia, verbose=True)
        print(f"  sweep took {time.perf_counter()-t0:.1f}s; winner "
              f"lanes={op_tuned.lanes} block_rows={op_tuned.block_rows}")
        r_tuned = measure(op_tuned, "fresh-tuned")

        # 3. warm cache: from_dia should now pick the persisted winner
        op_warm = PaddedDIA.from_dia(dia)
        r_warm = measure(op_warm, "warm-cache")

        same_geom = (op_warm.lanes, op_warm.block_rows) == (
            op_tuned.lanes, op_tuned.block_rows)

    spread = (max(r_default) - min(r_default)) / max(r_default) * 100
    gain = (max(r_tuned) - max(r_default)) / max(r_default) * 100
    print("\nSUMMARY")
    print(f"  default geometry ({op_default.lanes},{op_default.block_rows}): "
          f"{min(r_default):.1f}-{max(r_default):.1f} Gnnz/s "
          f"(run-to-run spread {spread:.1f}%)")
    print(f"  tuned geometry   ({op_tuned.lanes},{op_tuned.block_rows}): "
          f"{min(r_tuned):.1f}-{max(r_tuned):.1f} Gnnz/s "
          f"(gain over default {gain:+.1f}%)")
    print(f"  warm-cache rebuild picks winner: {same_geom}; "
          f"{min(r_warm):.1f}-{max(r_warm):.1f} Gnnz/s")
    verdict = ("GEOMETRY (stale/missing cache costs real throughput)"
               if gain > max(5.0, spread) else
               "TENANCY (geometry-invariant band; cache not the variable)")
    print(f"  diagnosis: {verdict}")


if __name__ == "__main__":
    main()
