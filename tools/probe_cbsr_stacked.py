"""Probe: can ComplexBSR close the MFU gap to real BSR? (VERDICT r4 #5)

Current form: TWO batched einsums (re-blocks x g, im-blocks x g) + one
plane-combined segment-sum. Hypothesis: ONE einsum over the stacked
(2*nblk, bs, bs) block batch pipelines better on the MXU (single larger
batch, one output buffer) at identical HBM traffic.

Run on the TPU chip: python tools/probe_cbsr_stacked.py
Writes a human-readable comparison; adopt the winner in sparse/bsr.py.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import measure_rtt
    from sprsolve_tpu.sparse.bsr import ComplexBSR
    from sprsolve_tpu.sparse.containers import CSR

    # same block-random workload as bench.py's general-sparsity section
    nG, bsG, bprG = 65536, 128, 4
    nbG = nG // bsG
    rgen = np.random.default_rng(3)
    brows = np.repeat(np.arange(nbG), bprG)
    bcols = rgen.integers(0, nbG, nbG * bprG)
    key = np.unique(brows.astype(np.int64) * nbG + bcols)
    brows, bcols = key // nbG, key % nbG
    nblkG = len(key)
    rowsG = (brows[:, None, None] * bsG + np.arange(bsG)[:, None]).repeat(bsG, axis=2)
    colsG = (bcols[:, None, None] * bsG + np.arange(bsG)[None, None, :]).repeat(bsG, axis=1)
    valsG = rgen.standard_normal(nblkG * bsG * bsG).astype(np.float32)
    rowsG, colsG = rowsG.reshape(-1), colsG.reshape(-1)
    orderG = np.lexsort((colsG, rowsG))
    indptrG = np.zeros(nG + 1, np.int64)
    np.add.at(indptrG, rowsG + 1, 1)
    np.cumsum(indptrG, out=indptrG)
    cvals = (valsG + 0.5j * rgen.standard_normal(len(valsG))).astype(np.complex64)
    Agc = CSR.from_arrays(cvals[orderG], colsG[orderG].astype(np.int32), indptrG, (nG, nG))
    cb = ComplexBSR.from_csr(Agc)
    nnz = Agc.nnz
    print(f"nblk={cb.nblk}, bs={cb.bs}, cnnz={nnz}")

    xr = jnp.asarray(rgen.standard_normal(nG).astype(np.float32))
    xi = jnp.asarray(rgen.standard_normal(nG).astype(np.float32))

    def stacked_matvec(o, xr, xi):
        """ONE einsum over the (2*nblk,) stacked block batch."""
        bs = o.bs
        nb = o.padded_dim // bs
        prec = jax.lax.Precision.HIGHEST

        def blockify(v):
            vp = jnp.zeros(o.padded_dim, v.dtype).at[: o.n].set(v)
            return vp.reshape(nb, bs)

        g = jnp.take(
            jnp.stack([blockify(xr), blockify(xi)], axis=-1), o.blk_col, axis=0
        )  # (nblk, bs, 2)
        B = jnp.concatenate([o.blocks_re, o.blocks_im], axis=0)  # (2nblk, bs, bs)
        G = jnp.concatenate([g, g], axis=0)
        P = jnp.einsum("bij,bjk->bik", B, G,
                       preferred_element_type=jnp.float32, precision=prec)
        pr, pi = P[: o.nblk], P[o.nblk:]
        stacked = jnp.stack(
            [pr[..., 0] - pi[..., 1], pr[..., 1] + pi[..., 0]], axis=-1
        )
        Y = jax.ops.segment_sum(
            stacked, o.blk_row, num_segments=nb, indices_are_sorted=True
        )
        return Y[..., 0].reshape(-1)[: o.n], Y[..., 1].reshape(-1)[: o.n]

    # correctness vs the current form
    yr0, yi0 = jax.jit(lambda o, a, b: o._planes_matvec(a, b))(cb, xr, xi)
    yr1, yi1 = jax.jit(stacked_matvec)(cb, xr, xi)
    np.testing.assert_allclose(np.asarray(yr0), np.asarray(yr1), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi0), np.asarray(yi1), rtol=1e-5, atol=1e-4)
    print("stacked == current: OK")

    def chain_time(fn, iters=100):
        @jax.jit
        def chain(o, pair, n_iters, bump):
            a = pair[0] * (jnp.float32(1.0) + bump)

            def body(_, p):
                yr, yi = fn(o, p[0], p[1])
                s = jnp.float32(0.125)
                return (yr * s, yi * s)

            return jax.lax.fori_loop(0, n_iters, body, (a, pair[1]), unroll=1)

        def run(k):
            out = chain(cb, (xr, xi), jnp.int32(iters), jnp.float32(k * 2**-16))
            float(out[0].ravel()[0])

        run(0)
        ts = []
        for k in range(2):
            t0 = time.perf_counter()
            run(k + 1)
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - measure_rtt()) / iters, 1e-9)

    t_cur = chain_time(lambda o, a, b: o._planes_matvec(a, b))
    t_stk = chain_time(stacked_matvec)
    print(f"current two-einsum : {t_cur*1e3:.3f} ms -> {nnz/t_cur/1e9:.2f} Gcnnz/s")
    print(f"stacked one-einsum : {t_stk*1e3:.3f} ms -> {nnz/t_stk/1e9:.2f} Gcnnz/s")
    print(f"winner: {'stacked' if t_stk < t_cur else 'current'} "
          f"({abs(1 - t_stk/t_cur)*100:.1f}% {'faster' if t_stk < t_cur else 'slower'})")


if __name__ == "__main__":
    main()
