"""Round-2 probe: fused-BiCGStab timing + halo-elimination facts + f64 + BSR.

Sections (ordered so a timeout still yields the key numbers):
  G. per-iteration cost of the redesigned 3-kernel bicgstab_fused vs the
     generic Pallas path on the 1M-row Poisson (the VERDICT #2 target:
     <110 us/iter).
  F. can the with_halo concats be eliminated?  F1: Element OUTPUT block
     with a constant row offset.  F2: input_output_aliases on pallas_call.
  E. f64 Pallas feasibility (elementwise, slice+concat shift) + XLA DIA
     f64 SpMV rate (VERDICT #4).
  D. BSR block-matvec rate at modest scale (VERDICT #1 bake-off).

Run: timeout 1800 python -u tools/probe_r2.py

HISTORICAL (round 2): the G section measured bicgstab_fused, which lost to
the XLA path (193 vs 154 us/iter) and was subsequently deleted — G now
fails by design; D/E/F sections remain runnable. Results are summarized in
BENCH_NOTES.md.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        float(np.asarray(leaf).ravel()[0].real)

    RTT = [None]

    def measure_rtt():
        f = jax.jit(lambda v: v + 1.0)
        x = jnp.float32(1.0)
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[2]

    def timed(fn, reps=2):
        fn()  # compile + warm
        if RTT[0] is None:
            RTT[0] = measure_rtt()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - RTT[0], 1e-9)

    # ------------------------------------------------------------------ G
    log("=== G. bicgstab per-iteration cost, 1M-row Poisson f32 ===")
    import sprsolve_tpu as sp
    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems

    A = problems.poisson3d(100, 100, 100, dtype=np.float32)
    n = A.shape[0]
    p = PaddedDIA.from_dia(A.to_dia())
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b2 = p.pad_vec(b)
    M = p.jacobi_precond()
    FORCED = 500

    try:
        f_fused = jax.jit(
            lambda: sp.bicgstab_fused(
                p, b2, diag_inv2=M.diag_inv, tol=0.0, max_iter=FORCED
            )
        )
        t = timed(lambda: fetch(f_fused()))
        log(f"G fused-3k: {t/FORCED*1e6:.1f} us/iter ({FORCED/t:.0f} iters/s)")
    except Exception as e:
        log(f"G fused-3k: FAIL {type(e).__name__}: {str(e)[:300]}")

    try:
        f_gen = jax.jit(
            lambda: sp.bicgstab(p, b2, M=M, tol=0.0, max_iter=FORCED)
        )
        t = timed(lambda: fetch(f_gen()))
        log(f"G generic-pallas: {t/FORCED*1e6:.1f} us/iter ({FORCED/t:.0f} iters/s)")
    except Exception as e:
        log(f"G generic-pallas: FAIL {type(e).__name__}: {str(e)[:300]}")

    # correctness cross-check at real tolerance
    try:
        xf, inf = jax.jit(
            lambda: sp.bicgstab_fused(
                p, b2, diag_inv2=M.diag_inv, tol=1e-4, max_iter=400
            )
        )()
        xg, ing = jax.jit(
            lambda: sp.bicgstab(p, b2, M=M, tol=1e-4, max_iter=400)
        )()
        rf = np.asarray(p.unpad_vec(xf))
        res = None
        import scipy.sparse as sps  # noqa
        log(
            f"G convergence: fused {int(inf.iterations)} its res {float(inf.residual):.3e} | "
            f"generic {int(ing.iterations)} its res {float(ing.residual):.3e}"
        )
    except Exception as e:
        log(f"G convergence: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ------------------------------------------------------------------ F
    log("=== F. halo-elimination facts ===")
    BR, LN, HR, NB = 256, 256, 8, 4
    H = NB * BR + 2 * HR

    # F1: Element OUTPUT block with constant row offset
    try:
        x = jnp.asarray(rng.standard_normal((H, LN)).astype(np.float32))

        def k1(x_ref, o_ref):
            o_ref[:, :] = x_ref[:, :] * 2.0

        f1 = pl.pallas_call(
            k1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(BR), pl.Element(LN)),
                    lambda i: (HR + i * BR, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (pl.Element(BR), pl.Element(LN)),
                lambda i: (HR + i * BR, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((H, LN), jnp.float32),
        )
        out = jax.jit(f1)(x)
        got = np.asarray(out)[HR : HR + NB * BR]
        want = np.asarray(x)[HR : HR + NB * BR] * 2.0
        log(f"F1 Element-out offset: OK err={np.abs(got-want).max()}")
    except Exception as e:
        log(f"F1 Element-out offset: FAIL {type(e).__name__}: {str(e)[:200]}")

    # F2: input_output_aliases (donate full-H buffer, write body blocks only)
    try:
        x = jnp.asarray(rng.standard_normal((H, LN)).astype(np.float32))
        buf = jnp.zeros((H, LN), jnp.float32)

        def k2(x_ref, b_ref, o_ref):
            o_ref[:, :] = x_ref[:, :] + 1.0

        f2 = pl.pallas_call(
            k2,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(BR), pl.Element(LN)),
                    lambda i: (HR + i * BR, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (pl.Element(BR), pl.Element(LN)),
                    lambda i: (HR + i * BR, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (pl.Element(BR), pl.Element(LN)),
                lambda i: (HR + i * BR, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((H, LN), jnp.float32),
            input_output_aliases={1: 0},
        )
        out = jax.jit(f2)(x, buf)
        o = np.asarray(out)
        body_ok = np.abs(o[HR : HR + NB * BR] - (np.asarray(x)[HR : HR + NB * BR] + 1.0)).max()
        halo_ok = max(np.abs(o[:HR]).max(), np.abs(o[-HR:]).max())
        log(f"F2 io-alias full-H: OK body_err={body_ok} halo_resid={halo_ok}")
    except Exception as e:
        log(f"F2 io-alias full-H: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ------------------------------------------------------------------ E
    log("=== E. f64 on-chip ===")
    xf64 = jnp.asarray(rng.standard_normal((256, 256)))
    try:
        f = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                (slice(None), slice(None)), x_ref[:, :] * 2.0 + 1.0
            ),
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float64),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(xf64)
        log(f"E1 elementwise f64: OK err={np.abs(np.asarray(out)-(np.asarray(xf64)*2+1)).max()}")
    except Exception as e:
        log(f"E1 elementwise f64: FAIL {type(e).__name__}: {str(e)[:150]}")

    try:
        def k_shift(x_ref, o_ref):
            w = x_ref[:, :]
            o_ref[:, :] = jnp.concatenate([w[:, 3:], w[:, :3]], axis=1)

        f = pl.pallas_call(
            k_shift,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float64),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(xf64)
        want = np.roll(np.asarray(xf64), -3, axis=1)
        log(f"E2 slice+concat shift f64: OK err={np.abs(np.asarray(out)-want).max()}")
    except Exception as e:
        log(f"E2 slice+concat shift f64: FAIL {type(e).__name__}: {str(e)[:150]}")

    try:
        from sprsolve_tpu.ops.spmv import spmv_dia

        A64 = problems.poisson3d(100, 100, 100, dtype=np.float64)
        dia64 = A64.to_dia()
        x64v = jnp.asarray(rng.standard_normal(A64.shape[0]))

        @jax.jit
        def chain64(nit, v):
            return jax.lax.fori_loop(
                0, nit, lambda _, u: spmv_dia(dia64, u) * 0.125, v, unroll=1
            )

        t = timed(lambda: fetch(chain64(jnp.int32(100), x64v)))
        log(f"E4 XLA DIA f64 1M Poisson: {t/100*1e3:.3f} ms/spmv -> {A64.nnz/(t/100)/1e9:.2f} Gnnz/s")
    except Exception as e:
        log(f"E4 XLA DIA f64: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ------------------------------------------------------------------ D
    log("=== D. BSR block matvec (modest scale) ===")
    try:
        from sprsolve_tpu.sparse.bsr import BSR
        from sprsolve_tpu.sparse.containers import CSR

        nD, bs, bpr = 65536, 128, 4
        nb = nD // bs
        r = np.random.default_rng(3)
        brows = np.repeat(np.arange(nb), bpr)
        bcols = r.integers(0, nb, nb * bpr)
        key = np.unique(brows.astype(np.int64) * nb + bcols)
        brows, bcols = key // nb, key % nb
        nblk = len(key)
        rows = (brows[:, None, None] * bs + np.arange(bs)[:, None]).repeat(bs, axis=2)
        cols = (bcols[:, None, None] * bs + np.arange(bs)[None, None, :]).repeat(bs, axis=1)
        vals = r.standard_normal(nblk * bs * bs).astype(np.float32)
        rows, cols = rows.reshape(-1), cols.reshape(-1)
        order = np.lexsort((cols, rows))
        indptr = np.zeros(nD + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        Ab = CSR.from_arrays(
            vals[order], cols[order].astype(np.int32), indptr, (nD, nD)
        )
        nnz = Ab.nnz
        op = BSR.from_csr(Ab, bs=bs)
        xv = jnp.asarray(r.standard_normal(nD).astype(np.float32))

        @jax.jit
        def chainb(nit, v):
            return jax.lax.fori_loop(
                0, nit, lambda _, u: op.matvec(u) * jnp.float32(0.125), v, unroll=1
            )

        t = timed(lambda: fetch(chainb(jnp.int32(100), xv)))
        log(
            f"D BSR bs={bs} nblk={op.nblk} nnz={nnz}: {t/100*1e3:.3f} ms/spmv "
            f"-> {nnz/(t/100)/1e9:.2f} Gnnz/s"
        )
    except Exception as e:
        log(f"D BSR: FAIL {type(e).__name__}: {str(e)[:300]}")

    log("probe_r2 done")


if __name__ == "__main__":
    main()
