"""Probe round 2: ComplexBSR einsum-shape variants (ROADMAP #4).

The batch-stacked (2*nblk) single-einsum variant measured 1% slower
(tools/probe_cbsr_stacked.py). Two NEW candidates that change the
per-block matmul SHAPE instead of the batch:

- rowstack: A planes concatenated along block ROWS -> (nblk, 2bs, bs);
  one einsum (2bs x bs)@(bs x 2) per block, M=2bs=256. Same traffic,
  half the batched-matmul launches, combine still needed.
- kstack: A planes concatenated along block COLS -> (nblk, bs, 2bs) and
  the gathered x planes arranged as G2 = [[xr, xi], [-xi, xr]]
  (nblk, 2bs, 2): ONE einsum computes y_re AND y_im DIRECTLY
  (y_re = A_re xr - A_im xi is row one of the K=2bs contraction) —
  the plane-combine pass disappears entirely. x-gather doubles
  (negligible: 2*bs*2 floats vs bs*bs*2 block floats per block).

Run on the TPU chip: python tools/probe_cbsr2.py
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
    prec = jax.lax.Precision.HIGHEST

    def blockify(o, v):
        vp = jnp.zeros(o.padded_dim, v.dtype).at[: o.n].set(v)
        return vp.reshape(o.padded_dim // o.bs, o.bs)

    def gather_planes(o, xr, xi):
        return jnp.take(
            jnp.stack([blockify(o, xr), blockify(o, xi)], axis=-1),
            o.blk_col, axis=0,
        )  # (nblk, bs, 2)

    def finish(o, stacked):
        nb = o.padded_dim // o.bs
        Y = jax.ops.segment_sum(
            stacked, o.blk_row, num_segments=nb, indices_are_sorted=True
        )
        return Y[..., 0].reshape(-1)[: o.n], Y[..., 1].reshape(-1)[: o.n]

    def rowstack_matvec(o, xr, xi):
        g = gather_planes(o, xr, xi)
        A2 = jnp.concatenate([o.blocks_re, o.blocks_im], axis=1)  # (nblk, 2bs, bs)
        P = jnp.einsum("bij,bjk->bik", A2, g,
                       preferred_element_type=jnp.float32, precision=prec)
        pr, pi = P[:, : o.bs], P[:, o.bs:]
        stacked = jnp.stack(
            [pr[..., 0] - pi[..., 1], pr[..., 1] + pi[..., 0]], axis=-1
        )
        return finish(o, stacked)

    def kstack_matvec(o, xr, xi):
        gb_r = jnp.take(blockify(o, xr), o.blk_col, axis=0)  # (nblk, bs)
        gb_i = jnp.take(blockify(o, xi), o.blk_col, axis=0)
        # G2 rows: top bs rows [xr, xi], bottom bs rows [-xi, xr]
        G2 = jnp.concatenate(
            [
                jnp.stack([gb_r, gb_i], axis=-1),
                jnp.stack([-gb_i, gb_r], axis=-1),
            ],
            axis=1,
        )  # (nblk, 2bs, 2)
        A2 = jnp.concatenate([o.blocks_re, o.blocks_im], axis=2)  # (nblk, bs, 2bs)
        stacked = jnp.einsum("bij,bjk->bik", A2, G2,
                             preferred_element_type=jnp.float32, precision=prec)
        return finish(o, stacked)  # already combined: (nblk, bs, 2)

    # correctness vs the current form
    yr0, yi0 = jax.jit(lambda o, a, b: o._planes_matvec(a, b))(cb, xr, xi)
    for name, fn in [("rowstack", rowstack_matvec), ("kstack", kstack_matvec)]:
        yr1, yi1 = jax.jit(fn)(cb, xr, xi)
        np.testing.assert_allclose(np.asarray(yr0), np.asarray(yr1), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(yi0), np.asarray(yi1), rtol=1e-5, atol=1e-4)
        print(f"{name} == current: OK")

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

    results = {}
    for name, fn in [
        ("current ", lambda o, a, b: o._planes_matvec(a, b)),
        ("rowstack", rowstack_matvec),
        ("kstack  ", kstack_matvec),
    ]:
        t = chain_time(fn)
        results[name] = t
        print(f"{name}: {t*1e3:.3f} ms -> {nnz/t/1e9:.2f} Gcnnz/s")
    best = min(results, key=results.get)
    t0 = results["current "]
    print(f"winner: {best.strip()} ({(1 - results[best]/t0)*100:+.1f}% vs current)")


if __name__ == "__main__":
    main()
