"""Microbenchmark Mosaic/Pallas gather primitives on the real chip.

probe_unstructured.py established that XLA-level gather runs at 0.14
Gelem/s (scalar-serialized) — the reason every unstructured-SpMV
formulation bottoms out near 0.1 Gnnz/s.  Mosaic rejected a 1-D in-kernel
gather with "Only 2D gather is supported", which implies SOME 2-D gather
lowers to vector hardware.  This probe measures each candidate primitive
in isolation inside a Pallas kernel:

  lane_shuffle   take_along_axis(a(S,128), idx(S,128), axis=1)
                 — per-row lane selection (the VPU shuffle network?)
  sublane_gather take_along_axis(a(S,128), idx(S,128), axis=0)
                 — per-lane cross-sublane selection
  row_gather     take(x2(R,128), idx(m,), axis=0) — whole-row gather
  tile_gather    broadcast 128-tile + take_along_axis axis=1
                 — random-within-128-columns gather (the SpMV building
                 block: entries bucketed by 128-column tile)

Each kernel loops its op inside the kernel over resident VMEM data, so the
number is the primitive's compute throughput, not HBM bandwidth.
"""

import os
import sys
import time
from functools import partial

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
    S, L = 512, 128
    REPS = 64   # in-kernel repetitions (loop-carried so nothing is hoisted)
    rng = np.random.default_rng(0)

    def timeit(fn, *args, iters=50):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters, out

    def report(name, build):
        try:
            fn, args, elems = build()
            t, _ = timeit(fn, *args)
            print(f"  {name:16s}: {t*1e6:9.1f} us for {REPS}x{elems} elems "
                  f"-> {REPS*elems/t/1e9:8.2f} Gelem/s")
        except Exception as e:
            print(f"  {name:16s}: FAILED {type(e).__name__}: {str(e)[:140]}")

    a = jnp.asarray(rng.standard_normal((S, L)).astype(np.float32))
    idx_lane = jnp.asarray(rng.integers(0, L, (S, L)).astype(np.int32))
    idx_sub = jnp.asarray(rng.integers(0, S, (S, L)).astype(np.int32))

    def chain_kernel(op):
        # v <- op(v + tiny, idx) repeated REPS times, loop-carried
        def kern(a_ref, i_ref, o_ref):
            v = a_ref[:]
            idx = i_ref[:]

            def body(_, v):
                return op(v, idx) + 1e-9

            v = jax.lax.fori_loop(0, REPS, body, v)
            o_ref[:] = v

        @jax.jit
        def run(a_, i_):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(a_.shape, a_.dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a_, i_)

        return run

    report("lane_shuffle", lambda: (
        chain_kernel(lambda v, i: jnp.take_along_axis(v, i, axis=1)),
        (a, idx_lane), S * L,
    ))
    report("sublane_gather", lambda: (
        chain_kernel(lambda v, i: jnp.take_along_axis(v, i, axis=0)),
        (a, idx_sub), S * L,
    ))

    # whole-row gather: take(x2(R,128), idx(m,), axis=0)
    R, m = 512, 512
    x2 = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    idx_row = jnp.asarray(rng.integers(0, R, (m,)).astype(np.int32))

    def row_gather_build():
        def kern(x_ref, i_ref, o_ref):
            x = x_ref[:]

            def body(_, v):
                g = jnp.take(x + v[0, 0] * 1e-9, i_ref[:], axis=0)
                return g

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((m, L), jnp.float32)
            )

        @jax.jit
        def run(x_, i_):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x_, i_)

        return run, (x2, idx_row), m * L

    report("row_gather", row_gather_build)

    # tile gather: broadcast one 128-wide tile to S sublanes, lane-select
    xt = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))

    def tile_gather_build():
        def kern(t_ref, i_ref, o_ref):
            tile = t_ref[:]

            def body(_, v):
                b = jnp.broadcast_to(tile + v[0, 0] * 1e-9, (S, L))
                return jnp.take_along_axis(b, i_ref[:], axis=1)

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((S, L), jnp.float32)
            )

        @jax.jit
        def run(t_, i_):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t_, i_)

        return run, (xt, idx_lane), S * L

    report("tile_gather", tile_gather_build)

    # 32-sublane gather: take_along_axis axis=0 with a SMALL source (one
    # (8,128) tile replicated): does a narrow range help?
    a8 = jnp.asarray(rng.standard_normal((8, L)).astype(np.float32))
    idx8 = jnp.asarray(rng.integers(0, 8, (S, L)).astype(np.int32))

    def sub8_build():
        def kern(a_ref, i_ref, o_ref):
            src = a_ref[:]

            def body(_, v):
                return jnp.take_along_axis(
                    src + v[:8] * 1e-9, i_ref[:], axis=0,
                )

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((S, L), jnp.float32)
            )

        @jax.jit
        def run(a_, i_):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a_, i_)

        return run, (a8, idx8), S * L

    report("sub8_gather", sub8_build)


if __name__ == "__main__":
    main()
