"""Measure candidate TPU formulations for UNSTRUCTURED sparse SpMV.

VERDICT r4 missing #1: patterns with neither a narrow(able) band nor dense
blocks fall to the ELL gather path at 0.12 Gnnz/s.  The reference bar is
MKL's memory-speed arbitrary-CSR mv.  Before designing a kernel, measure
what each primitive actually delivers on this chip:

  gather1d     pure jnp.take throughput (nnz random int32 into n-vector)
               — the ceiling for every gather-based formulation
  ell          current (n, k) 2-D take + reduce        [the 0.12 path]
  ell_T        transposed ELL: k separate 1-D takes of (n,) index vectors
  coo_segsum   sorted-COO: take + segment_sum(sorted)
  csr_spmm1    the CSR path with a width-1 SpMM
  pallas_take  Pallas kernel, x resident in VMEM, per-block jnp.take
               (does Mosaic lower a dynamic VMEM gather at speed?)

Patterns: sps.random (uniform Erdos-Renyi-ish, the compat-matrix class) and
a power-law graph (rows with wildly varying nnz).

Run on the real TPU:  python tools/probe_unstructured.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patterns(n, avg_nnz):
    import scipy.sparse as sps

    out = {}
    S = sps.random(n, n, density=avg_nnz / n, random_state=7, format="csr",
                   dtype=np.float32)
    S.setdiag(S.diagonal() + avg_nnz)
    S.sort_indices()
    out["uniform-random"] = S.tocsr()

    # power-law: preferential-attachment-ish column distribution
    rng = np.random.default_rng(11)
    nnz = n * avg_nnz
    rows = rng.integers(0, n, nnz)
    # zipf-distributed column popularity, shuffled assignment
    ranks = (rng.zipf(1.5, nnz) - 1) % n
    perm = rng.permutation(n)
    cols = perm[ranks]
    vals = rng.standard_normal(nnz).astype(np.float32)
    P = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    P.sum_duplicates()
    P.setdiag(P.diagonal() + avg_nnz)
    P.sort_indices()
    out["power-law"] = P.tocsr()
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import sprsolve_tpu as sp
    from bench import time_spmv

    print("device:", jax.devices()[0])
    n = 1 << 16          # 65,536 rows — x is 256 KB, far under VMEM
    avg = 16

    def bench_fn(label, fn, op, x, nnz, iters=200):
        try:
            t = time_spmv(fn, op, x, iters=iters)
            print(f"  {label:14s}: {t*1e6:9.1f} us -> {nnz/t/1e9:8.2f} Gnnz/s")
            return nnz / t / 1e9
        except Exception as e:
            print(f"  {label:14s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return 0.0

    # --- primitive ceiling: pure gather throughput
    rng = np.random.default_rng(0)
    for m_idx in (1 << 20, 1 << 22):
        idx = jnp.asarray(rng.integers(0, n, m_idx).astype(np.int32))
        xsrc = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def take_chain(idxop, v):
            # v is the gathered (m,) result; chain by feeding a scalar back
            return jnp.take(xsrc + v[0], idxop)

        t = time_spmv(take_chain, idx, jnp.zeros(m_idx, jnp.float32),
                      iters=100)
        print(f"gather1d m={m_idx}: {t*1e6:9.1f} us -> "
              f"{m_idx/t/1e9:8.2f} Gelem/s")

    for name, S in _patterns(n, avg).items():
        nnz = S.nnz
        kmax = int(np.diff(S.indptr).max())
        print(f"\npattern {name}: n={n} nnz={nnz} avg/row={nnz/n:.1f} "
              f"max/row={kmax}")
        A = sp.csr_from_scipy(S)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        # current ELL path
        ell = A.to_ell()
        from sprsolve_tpu.ops.spmv import spmv_ell

        print(f"  [ell k={ell.k} pad waste {ell.k*n/nnz:.1f}x]")
        bench_fn("ell", spmv_ell, ell, x, nnz, iters=20)

        # transposed ELL: k 1-D gathers
        cols_T = jnp.asarray(np.asarray(ell.cols).T.copy())   # (k, n)
        data_T = jnp.asarray(np.asarray(ell.data).T.copy())

        def ell_T(op, v):
            cT, dT = op
            y = jnp.zeros_like(v)
            for k in range(cT.shape[0]):
                y = y + dT[k] * jnp.take(v, cT[k])
            return y

        bench_fn("ell_T", ell_T, (cols_T, data_T), x, nnz, iters=20)

        # sorted-COO segment-sum
        def coo_seg(op, v):
            dat, cols, rows = op
            return jax.ops.segment_sum(
                dat * jnp.take(v, cols), rows, num_segments=n,
                indices_are_sorted=True,
            )

        coo = (jnp.asarray(S.data), jnp.asarray(S.indices.astype(np.int32)),
               jnp.asarray(np.repeat(np.arange(n, dtype=np.int32),
                                     np.diff(S.indptr))))
        bench_fn("coo_segsum", coo_seg, coo, x, nnz, iters=20)

        # CSR spmm width-1
        from sprsolve_tpu.ops.spmv import spmm_csr

        def csr1(op, v):
            return spmm_csr(op, v[:, None])[:, 0]

        bench_fn("csr_spmm1", csr1, A, x, nnz, iters=20)

        # Pallas: x in VMEM, blocked ELL take
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            BR = 512  # rows per grid step
            k = ell.k
            n_pad = ((n + BR - 1) // BR) * BR

            cols_p = np.zeros((n_pad, k), np.int32)
            data_p = np.zeros((n_pad, k), np.float32)
            cols_p[:n] = np.asarray(ell.cols)
            data_p[:n] = np.asarray(ell.data)

            def kern(x_ref, c_ref, d_ref, o_ref):
                xx = x_ref[:]
                g = jnp.take(xx, c_ref[:], axis=0)
                o_ref[:] = jnp.sum(d_ref[:] * g, axis=1)

            @jax.jit
            def pallas_take(ops, v):
                c, d = ops
                return pl.pallas_call(
                    kern,
                    grid=(n_pad // BR,),
                    in_specs=[
                        pl.BlockSpec((n,), lambda i: (0,),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((BR, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((BR, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((BR,), lambda i: (i,),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                )(v, c, d)[:n]

            got = np.asarray(pallas_take((jnp.asarray(cols_p),
                                          jnp.asarray(data_p)), x))
            want = np.asarray(S @ np.asarray(x))
            err = np.abs(got - want).max() / max(np.abs(want).max(), 1)
            print(f"  [pallas_take err {err:.2e}]")
            bench_fn(
                "pallas_take",
                lambda ops, v: pallas_take(ops, v),
                (jnp.asarray(cols_p), jnp.asarray(data_p)), x, nnz, iters=20,
            )
        except Exception as e:
            print(f"  pallas_take   : FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
