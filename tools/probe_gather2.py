"""Round-2 primitive probe for the routed-SpMV design.

Validates the exact shapes the kernel needs (equal-shape
take_along_axis → tpu.dynamic_gather, per Mosaic lowering.py:2464-2524):

  g1_long    axis=1 gather at (128, W) for W = 512 / 2048 / 9216
             — phase-1 x-expand and stage-C sort both need long-lane rows
  g0_sub     axis=0 gather at (8,128) / (128,128) / (512,128)
             — would enable 2-step windowed gathers (optional)
  xla_T      jnp.transpose (128, W) <-> (W, 128) at the XLA level
             — the Clos middle-stage transposes
  phase1_e2e realistic phase-1: x resident in VMEM (128, T), idx/vals
             streamed from HBM in (128, T) blocks over a K1 grid,
             P written to HBM — the end-to-end Gnnz/s of the gather stage
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    REPS = 32

    def timeit(fn, *args, iters=50):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    def report(name, build, elems):
        try:
            fn, args = build()
            t = timeit(fn, *args)
            print(f"  {name:20s}: {t*1e6:9.1f} us -> "
                  f"{elems/t/1e9:8.2f} Gelem/s")
        except Exception as e:
            print(f"  {name:20s}: FAILED {type(e).__name__}: {str(e)[:110]}")

    def resident_chain(shape, axis):
        S0, S1 = shape
        a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        hi = shape[axis]
        idx = jnp.asarray(rng.integers(0, hi, shape).astype(np.int32))

        def kern(a_ref, i_ref, o_ref):
            v = a_ref[:]
            idx_ = i_ref[:]

            def body(_, v):
                return jnp.take_along_axis(v, idx_, axis=axis) + 1e-9

            o_ref[:] = jax.lax.fori_loop(0, REPS, body, v)

        @jax.jit
        def run(a_, i_):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a_, i_)

        return run, (a, idx)

    for W in (512, 2048, 9216):
        report(f"g1_long (128,{W})",
               lambda W=W: resident_chain((128, W), 1), REPS * 128 * W)
    for S in (8, 128, 512):
        report(f"g0_sub ({S},128)",
               lambda S=S: resident_chain((S, 128), 0), REPS * S * 128)

    # XLA transpose speed (128, W) -> (W, 128)
    for W in (9216, 36864):
        a = jnp.asarray(rng.standard_normal((128, W)).astype(np.float32))

        @jax.jit
        def tchain(a_):
            def body(_, v):
                return (v + 1e-9).T

            # even REPS so shape returns to the original
            return jax.lax.fori_loop(0, 2, body, a_)

        t = timeit(tchain, a)
        print(f"  xla_T (128,{W}) x2   : {t*1e6:9.1f} us -> "
              f"{2*128*W/t/1e9:8.2f} Gelem/s per pass")

    # realistic phase-1: x resident, idx/vals streamed, grid over K1
    n = 1 << 18                    # 262,144
    T = n // 128                   # 2048
    K1 = 18
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xT = x.reshape(T, 128).T.copy()          # (128, T)
    tidx = jnp.asarray(rng.integers(0, T, (128, K1 * T)).astype(np.int32))
    vals = jnp.asarray(
        rng.standard_normal((128, K1 * T)).astype(np.float32)
    )

    def p1_kern(x_ref, i_ref, v_ref, o_ref):
        o_ref[:] = v_ref[:] * jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def phase1(xT_, i_, v_):
        return pl.pallas_call(
            p1_kern,
            grid=(K1,),
            in_specs=[
                pl.BlockSpec((128, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, K1 * T), jnp.float32),
        )(xT_, i_, v_)

    try:
        # correctness spot check
        P = np.asarray(phase1(xT, tidx, vals))
        lam = rng.integers(0, 128, 100)
        j = rng.integers(0, K1 * T, 100)
        want = np.asarray(vals)[lam, j] * np.asarray(x)[
            np.asarray(tidx)[lam, j] * 128 + lam
        ]
        err = np.abs(P[lam, j] - want).max()
        t = timeit(phase1, xT, tidx, vals)
        m = 128 * K1 * T
        print(f"  phase1_e2e n={n} m={m}: {t*1e6:9.1f} us -> "
              f"{m/t/1e9:8.2f} Gelem/s (err {err:.1e}; "
              f"{(m*(4+4+4)+n*4)/t/1e9:.0f} GB/s streamed)")
    except Exception as e:
        print(f"  phase1_e2e: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
