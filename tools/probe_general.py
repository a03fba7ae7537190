"""Probe battery for the general-sparsity SpMV design space (round 2).

Candidates needing hardware facts:
  A. lane-axis take_along_axis (per-sublane-row gather within a window) —
     the primitive a fixed-routing-network SpMV would be built from.
  B. XLA transpose throughput (the column phase of a routing network).
  C. XLA row-granular gather (jnp.take axis=0 of wide rows) — src staging
     and BSR x-block gathers.
  D. BSR batched-block matvec rates at block sizes 8/32/128 on block-random
     and pure-random patterns.
  E. f64 Pallas feasibility: elementwise, static lane slices + concat
     (the no-roll band shift), and the XLA DIA f64 rate for comparison.

Run on the real chip: timeout 1500 python -u tools/probe_general.py
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
    jax.config.update("jax_enable_x64", True)  # E-probes need f64 arrays
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        float(np.asarray(leaf).ravel()[0].real)

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

    RTT = [None]

    def time_chain(fn, x0, iters=200):
        """Time x <- fn(x) chained `iters` times in one dispatch."""

        @jax.jit
        def chain(n, x):
            return jax.lax.fori_loop(0, n, lambda _, v: fn(v), x, unroll=1)

        fetch(chain(jnp.int32(iters), x0))  # compile+warm
        if RTT[0] is None:
            RTT[0] = measure_rtt()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(chain(jnp.int32(iters), x0))
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - RTT[0]) / iters, 1e-9)

    # ---------------------------------------------------------- A. lane gather
    log("=== A. lane-axis take_along_axis (XLA level) ===")
    for a, b in [(8, 2048), (256, 2048), (4096, 512), (4096, 2048), (8192, 1024)]:
        try:
            x = jnp.asarray(rng.standard_normal((a, b)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, b, (a, b)).astype(np.int32))

            def g(v, idx=idx):
                return jnp.take_along_axis(v, idx, axis=1)

            out = jax.jit(g)(x)
            want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
            err = np.abs(np.asarray(out) - want).max()
            t = time_chain(g, x, iters=300)
            log(f"A xla ({a},{b}): OK err={err} {a*b/t/1e9:.2f} Gelt/s ({t*1e6:.1f} us)")
        except Exception as e:
            log(f"A xla ({a},{b}): FAIL {type(e).__name__}: {str(e)[:150]}")

    log("=== A2. lane-axis take_along_axis inside Pallas, gridded ===")
    for br, b in [(8, 2048), (64, 2048), (256, 512), (256, 2048)]:
        try:
            A_, B_ = 4096, b
            x = jnp.asarray(rng.standard_normal((A_, B_)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, B_, (A_, B_)).astype(np.int32))

            def k(x_ref, i_ref, o_ref):
                o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)

            spec = pl.BlockSpec((br, B_), lambda i: (i, 0), memory_space=pltpu.VMEM)
            f = pl.pallas_call(
                k,
                grid=(A_ // br,),
                in_specs=[spec, spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((A_, B_), jnp.float32),
            )
            out = jax.jit(f)(x, idx)
            want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
            err = np.abs(np.asarray(out) - want).max()

            def g2(v, idx=idx, f=f):
                return f(v, idx)

            t = time_chain(g2, x, iters=300)
            log(f"A2 pallas br={br} b={b}: OK err={err} {A_*B_/t/1e9:.2f} Gelt/s")
        except Exception as e:
            log(f"A2 pallas br={br} b={b}: FAIL {type(e).__name__}: {str(e)[:150]}")

    # ------------------------------------------------------------ B. transpose
    log("=== B. transpose (4096, 2048) f32 ===")
    try:
        x = jnp.asarray(rng.standard_normal((4096, 2048)).astype(np.float32))

        def tr(v):
            return v.T.reshape(4096, 2048) * jnp.float32(1.0000001)

        t = time_chain(tr, x, iters=200)
        nbytes = 4096 * 2048 * 4
        log(f"B transpose: {t*1e6:.1f} us -> {2*nbytes/t/1e9:.0f} GB/s effective")
    except Exception as e:
        log(f"B transpose: FAIL {type(e).__name__}: {str(e)[:150]}")

    # ------------------------------------------------------- C. row gather
    log("=== C. row-granular gather (jnp.take axis=0) ===")
    for nrows, width, ntake in [(8192, 1024, 8192), (65536, 128, 65536), (8192, 256, 32768)]:
        try:
            x = jnp.asarray(rng.standard_normal((nrows, width)).astype(np.float32))
            ridx = jnp.asarray(rng.integers(0, nrows, ntake).astype(np.int32))

            def g(v, ridx=ridx):
                return jnp.take(v, ridx, axis=0)

            out = jax.jit(g)(x)
            want = np.asarray(x)[np.asarray(ridx)]
            err = np.abs(np.asarray(out) - want).max()

            def chainable(v, ridx=ridx, nrows=nrows):
                o = jnp.take(v, ridx, axis=0) * jnp.float32(0.999)
                return o[:nrows] if o.shape[0] >= nrows else jnp.tile(o, (nrows // o.shape[0], 1))

            x0 = x
            t = time_chain(chainable, x0, iters=100)
            gb = ntake * width * 4 * 2 / t / 1e9
            log(f"C take rows ({nrows},{width})x{ntake}: err={err} {t*1e6:.1f} us -> {gb:.0f} GB/s")
        except Exception as e:
            log(f"C take rows ({nrows},{width}): FAIL {type(e).__name__}: {str(e)[:150]}")

    # ------------------------------------------------------------- D. BSR rates
    log("=== D. BSR batched block matvec ===")
    sys.path.insert(0, "/root/repo")
    from sprsolve_tpu.sparse.bsr import BSR
    from sprsolve_tpu.sparse.containers import CSR

    def random_block_csr(n, bs, blocks_per_browrow, seed):
        """Block-random pattern: dense (bs,bs) blocks at random block coords."""
        nb = n // bs
        r = np.random.default_rng(seed)
        brows = np.repeat(np.arange(nb), blocks_per_browrow)
        bcols = r.integers(0, nb, nb * blocks_per_browrow)
        # dedupe (brow, bcol)
        key = np.unique(brows.astype(np.int64) * nb + bcols)
        brows, bcols = key // nb, key % nb
        nblk = len(key)
        rows = (brows[:, None, None] * bs + np.arange(bs)[:, None]).repeat(bs, axis=2)
        cols = (bcols[:, None, None] * bs + np.arange(bs)[None, None, :]).repeat(bs, axis=1)
        vals = r.standard_normal(nblk * bs * bs).astype(np.float32)
        rows, cols = rows.reshape(-1), cols.reshape(-1)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSR.from_arrays(vals, cols.astype(np.int32), indptr, (n, n))

    # D1: block-structured, n=262144, bs=128, ~6 blocks per block-row
    try:
        n = 262144
        Ab = random_block_csr(n, 128, 6, 1)
        nnz = Ab.nnz
        for bs in (128,):
            op = BSR.from_csr(Ab, bs=bs)
            x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            want = None

            def mv(v, op=op):
                return op.matvec(v) * jnp.float32(0.125)

            t = time_chain(mv, x, iters=100)
            log(
                f"D1 BSR block-random bs={bs}: nblk={op.nblk} nnz={nnz} "
                f"{t*1e3:.3f} ms -> {nnz/t/1e9:.2f} Gnnz/s"
            )
    except Exception as e:
        log(f"D1 BSR: FAIL {type(e).__name__}: {str(e)[:200]}")

    # D2: pure-random scalar pattern, n=262144, k=8, small blocks
    try:
        n, k = 262144, 8
        r = np.random.default_rng(2)
        cols = r.integers(0, n, (n, k)).astype(np.int32)
        vals = r.standard_normal((n, k)).astype(np.float32)
        indptr = np.arange(0, n * k + 1, k, dtype=np.int64)
        Ar = CSR.from_arrays(vals.reshape(-1), cols.reshape(-1), indptr, (n, n))
        for bs in (8, 32):
            try:
                op = BSR.from_csr(Ar, bs=bs)
                x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

                def mv(v, op=op):
                    return op.matvec(v) * jnp.float32(0.125)

                t = time_chain(mv, x, iters=50)
                log(
                    f"D2 BSR pure-random bs={bs}: nblk={op.nblk} fill={op.fill_ratio:.3f} "
                    f"{t*1e3:.3f} ms -> {n*k/t/1e9:.2f} Gnnz/s"
                )
            except Exception as e:
                log(f"D2 BSR bs={bs}: FAIL {type(e).__name__}: {str(e)[:150]}")
    except Exception as e:
        log(f"D2 setup: FAIL {type(e).__name__}: {str(e)[:150]}")

    # ------------------------------------------------------------ E. f64 pallas
    log("=== E. f64 Pallas feasibility ===")

    def try_kernel(name, kern, inputs, out_shape):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = jax.jit(f)(*inputs)
            return out
        except Exception as e:
            log(f"E {name}: FAIL {type(e).__name__}: {str(e)[:150]}")
            return None

    xf64 = jnp.asarray(rng.standard_normal((256, 256)))
    if str(xf64.dtype) != "float64":
        log("E: x64 not enabled in this process; enabling via config is too late. skip")
    else:
        # E1 elementwise
        out = try_kernel(
            "elementwise f64",
            lambda x_ref, o_ref: o_ref.__setitem__((slice(None), slice(None)), x_ref[:, :] * 2.0 + 1.0),
            [xf64],
            jax.ShapeDtypeStruct((256, 256), jnp.float64),
        )
        if out is not None:
            err = np.abs(np.asarray(out) - (np.asarray(xf64) * 2 + 1)).max()
            log(f"E elementwise f64: OK err={err}")

        # E2 static lane shift via two slices + concat (the no-roll band shift)
        def k_shift(x_ref, o_ref):
            w = x_ref[:, :]
            r = 3
            o_ref[:, :] = jnp.concatenate([w[:, r:], w[:, :r]], axis=1)

        out = try_kernel(
            "static slice+concat f64",
            k_shift,
            [xf64],
            jax.ShapeDtypeStruct((256, 256), jnp.float64),
        )
        if out is not None:
            want = np.roll(np.asarray(xf64), -3, axis=1)
            log(f"E slice+concat f64: OK err={np.abs(np.asarray(out)-want).max()}")

        # E3 where + iota mask merge in f64 (the roll-free shifted-window form)
        def k_mask(x_ref, o_ref):
            w = x_ref[:, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
            a = jnp.concatenate([w[:, 3:], w[:, :3]], axis=1)
            b = jnp.concatenate([w[1:, :], w[:1, :]], axis=0)
            o_ref[:, :] = jnp.where(lane < 253, a, jnp.concatenate([b[:, 3:], b[:, :3]], axis=1))

        out = try_kernel(
            "masked shift f64",
            k_mask,
            [xf64],
            jax.ShapeDtypeStruct((256, 256), jnp.float64),
        )
        if out is not None:
            log("E masked shift f64: OK (lowered)")

    # E4: XLA DIA f64 SpMV rate on 1M-row Poisson
    try:
        from sprsolve_tpu.ops.spmv import spmv_dia
        from sprsolve_tpu.utils import problems

        A = problems.poisson3d(100, 100, 100, dtype=np.float64)
        dia = A.to_dia()
        n1 = A.shape[0]
        x = jnp.asarray(rng.standard_normal(n1))

        def mv(v, dia=dia):
            return spmv_dia(dia, v) * 0.125

        t = time_chain(mv, x, iters=100)
        log(f"E4 XLA DIA f64 1M Poisson: {t*1e3:.3f} ms -> {A.nnz/t/1e9:.2f} Gnnz/s")
    except Exception as e:
        log(f"E4: FAIL {type(e).__name__}: {str(e)[:200]}")

    log("probe_general done")


if __name__ == "__main__":
    main()
