"""Probe: which gather forms lower in Mosaic (Pallas TPU), and how fast.

The general-sparsity SpMV needs x[cols] with arbitrary cols. XLA's HBM gather
runs at ~8 ns/element (bench: ELL 0.12 Gnnz/s). If a VMEM-resident gather
lowers in Pallas, a column-panel ELL kernel becomes viable. This probe tries
the candidate forms on the real chip and times the survivors.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"device: {jax.devices()[0]}")

    R, C = 512, 512  # x buffer: 256K elements, 1MB f32 in VMEM
    BR = R  # mosaic dynamic_gather requires idx.shape == x.shape

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    # per-(row, lane) random sublane indices
    idx = jnp.asarray(rng.integers(0, R, (BR, C)).astype(np.int32))

    # --- form 1: sublane dynamic gather out[i,j] = x[idx[i,j], j]
    def k_sublane(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)

    try:
        f = pl.pallas_call(
            k_sublane,
            out_shape=jax.ShapeDtypeStruct((BR, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(f)(x2, idx)
        want = np.take_along_axis(np.asarray(x2), np.asarray(idx), axis=0)
        err = np.abs(np.asarray(out) - want).max()
        log(f"form1 sublane take_along_axis: OK, err={err}")
    except Exception as e:
        log(f"form1 sublane take_along_axis: FAIL {type(e).__name__}: {str(e)[:200]}")

    # --- form 2: flat jnp.take of arbitrary indices (full 2D relayout)
    def k_flat(x_ref, i_ref, o_ref):
        flat = x_ref[:, :].reshape(-1)
        o_ref[:, :] = jnp.take(flat, i_ref[:, :], axis=0)

    idx_flat = jnp.asarray(rng.integers(0, R * C, (BR, C)).astype(np.int32))
    try:
        f2 = pl.pallas_call(
            k_flat,
            out_shape=jax.ShapeDtypeStruct((BR, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out2 = jax.jit(f2)(x2, idx_flat)
        want2 = np.asarray(x2).reshape(-1)[np.asarray(idx_flat)]
        err2 = np.abs(np.asarray(out2) - want2).max()
        log(f"form2 flat take: OK, err={err2}")
    except Exception as e:
        log(f"form2 flat take: FAIL {type(e).__name__}: {str(e)[:200]}")

    # --- timing for whichever compiled (chained to beat dispatch noise)
    def time_kernel(fn, *args, iters=200):
        @jax.jit
        def chain(n, *a):
            def body(_, acc):
                return acc + fn(*a)[0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        jax.block_until_ready(chain(jnp.int32(iters), *args))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(jnp.int32(iters), *args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chain(jnp.int32(iters // 5), *args))
        t2 = time.perf_counter() - t0
        return (t1 - t2) / (iters - iters // 5)

    n_gather = BR * C
    try:
        t = time_kernel(f, x2, idx)
        log(f"form1 rate: {n_gather/t/1e9:.2f} G gathers/s ({t*1e6:.1f} us per call)")
    except Exception as e:
        log(f"form1 timing failed: {type(e).__name__}")
    try:
        t = time_kernel(f2, x2, idx_flat)
        log(f"form2 rate: {n_gather/t/1e9:.2f} G gathers/s ({t*1e6:.1f} us per call)")
    except Exception as e:
        log(f"form2 timing failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
