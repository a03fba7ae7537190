"""Round-3 primitive probe: the building blocks of a routed (Benes) SpMV.

probe_gather2 pinned the constraint: tpu.dynamic_gather needs exactly 128
lanes (axis=1, any row count) or exactly 8 rows (axis=0).  A general
unstructured SpMV then routes products through selection stages
(within-128-lane gathers) and digit-swap wirings (XLA transposes).  This
probe measures each at REALISTIC streaming sizes:

  sel_stream   full selection stage: (M,128) f32 + int32 idx streamed
               HBM->VMEM->HBM through a gridded Pallas kernel
  sel_fused2   two chained selections in ONE kernel pass (idx2 applied to
               the result of idx1) — does fusing halve the HBM cost?
  swapT_01     XLA transpose (A,128,128) axes (0,2,1) — within-block
  swapT_02     XLA transpose axes (2,1,0) — long-range digit swap
  sub8_block   blocked axis=0 gather: in-kernel loop over 8-row slices of
               a (512,128) block (radix-1024 candidate)
  xla_rowgather static row permutation at XLA level: take(P,(M,),axis=0)
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

    def timeit(fn, *args, iters=100):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    M = 9216              # ~1.18M elements, the 65k-row bench scale
    BR = 1024             # rows per grid block
    P = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
    I1 = jnp.asarray(rng.integers(0, 128, (M, 128)).astype(np.int32))
    I2 = jnp.asarray(rng.integers(0, 128, (M, 128)).astype(np.int32))
    N = M * 128

    def sel_kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:], i_ref[:], axis=1)

    @jax.jit
    def sel_stream(p, i):
        return pl.pallas_call(
            sel_kern,
            grid=(M // BR,),
            in_specs=[
                pl.BlockSpec((BR, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(p, i)

    t = timeit(sel_stream, P, I1)
    print(f"  sel_stream      : {t*1e6:8.1f} us -> {N/t/1e9:7.2f} Gelem/s "
          f"({N*12/t/1e9:.0f} GB/s)")
    # correctness
    got = np.asarray(sel_stream(P, I1))
    want = np.take_along_axis(np.asarray(P), np.asarray(I1), axis=1)
    assert np.array_equal(got, want), "sel_stream wrong"

    def sel2_kern(p_ref, i1_ref, i2_ref, o_ref):
        a = jnp.take_along_axis(p_ref[:], i1_ref[:], axis=1)
        o_ref[:] = jnp.take_along_axis(a, i2_ref[:], axis=1)

    @jax.jit
    def sel_fused2(p, i1, i2):
        return pl.pallas_call(
            sel2_kern,
            grid=(M // BR,),
            in_specs=[
                pl.BlockSpec((BR, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ] * 3,
            out_specs=pl.BlockSpec((BR, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(p, i1, i2)

    t = timeit(sel_fused2, P, I1, I2)
    print(f"  sel_fused2      : {t*1e6:8.1f} us -> {2*N/t/1e9:7.2f} "
          f"Gelem(sel)/s")

    # int16 index stream: does narrower idx help?
    I1_16 = I1.astype(jnp.int16)

    def sel16_kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            p_ref[:], i_ref[:].astype(jnp.int32), axis=1
        )

    @jax.jit
    def sel_stream16(p, i):
        return pl.pallas_call(
            sel16_kern,
            grid=(M // BR,),
            in_specs=[
                pl.BlockSpec((BR, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(p, i)

    try:
        t = timeit(sel_stream16, P, I1_16)
        print(f"  sel_stream_i16  : {t*1e6:8.1f} us -> {N/t/1e9:7.2f} Gelem/s")
    except Exception as e:
        print(f"  sel_stream_i16  : FAILED {type(e).__name__}: {str(e)[:100]}")

    # XLA digit-swap transposes
    A3 = P.reshape(M // 128, 128, 128)

    @jax.jit
    def swap01(a):
        return jnp.transpose(a, (0, 2, 1)) + 0.0

    @jax.jit
    def swap02(a):
        return jnp.transpose(a, (2, 1, 0)) + 0.0

    for name, fn in (("swapT_01", swap01), ("swapT_02", swap02)):
        t = timeit(fn, A3)
        print(f"  {name}        : {t*1e6:8.1f} us -> {N/t/1e9:7.2f} Gelem/s")

    # blocked sublane gather: loop over 8-row slices inside one kernel
    S8 = 512
    A8 = jnp.asarray(rng.standard_normal((S8, 128)).astype(np.float32))
    I8 = jnp.asarray(rng.integers(0, 8, (S8, 128)).astype(np.int32))

    def sub8_kern(a_ref, i_ref, o_ref):
        def body(b, _):
            blk = a_ref[pl.ds(b * 8, 8), :]
            ib = i_ref[pl.ds(b * 8, 8), :]
            o_ref[pl.ds(b * 8, 8), :] = jnp.take_along_axis(blk, ib, axis=0)
            return 0

        jax.lax.fori_loop(0, S8 // 8, body, 0)

    @jax.jit
    def sub8(a, i):
        return pl.pallas_call(
            sub8_kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S8, 128), jnp.float32),
        )(a, i)

    try:
        t = timeit(sub8, A8, I8)
        print(f"  sub8_block      : {t*1e6:8.1f} us -> "
              f"{S8*128/t/1e9:7.2f} Gelem/s")
    except Exception as e:
        print(f"  sub8_block      : FAILED {type(e).__name__}: {str(e)[:100]}")

    # XLA static row gather
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))

    @jax.jit
    def rowgather(p, pr):
        return jnp.take(p, pr, axis=0)

    t = timeit(rowgather, P, perm)
    print(f"  xla_rowgather   : {t*1e6:8.1f} us -> {N/t/1e9:7.2f} Gelem/s")


if __name__ == "__main__":
    main()
