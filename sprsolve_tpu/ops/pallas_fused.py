"""Fused Lanczos-step kernel for the MINRES Pallas path.

The fused orthogonalization+norm below is the one solve-loop fusion that
*pays* on this hardware: MINRES runs at ~47 µs/iter on the 1M-row Poisson
(one 42 µs SpMV + this kernel + scalar Givens work).

BiCGStab fusion history (rounds 1-2, measured on v5e): two generations of
fused step kernels — (a) M-apply+SpMV+dot phases, (b) a full three-kernel
iteration with p/s updates folded into the SpMV windows, the Jacobi diagonal
folded into the bands, and a tail kernel producing ‖r‖² and the next ρ —
both LOST to the plain XLA path (154 µs/iter generic vs 157/193 fused;
interleaved re-runs confirm the ordering).  XLA's multi-output loop-body
fusion around the two Pallas SpMVs already reaches the practical floor; the
extra Element-window reads (~1.3× body traffic) and per-kernel setup of the
hand-fused passes cancel the pass savings, and the with_halo concatenates
(body→padded layout) cannot be eliminated — Element output specs with a row
offset and pallas input_output_aliases both crash this backend (probe_r2).
The fused solver was therefore deleted (reference hot loop stays
``src/bicg_stab.rs:122-197`` semantics in ``solvers/bicgstab.py``); see
BENCH_NOTES.md for the full measurement table.

Real dtypes only (the complex path composes per plane at a higher level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv import _I0, _pallas_call


def _orth_norm_kernel(
    a_ref, vold_ref, v_ref, beta_ref, alpha_ref, out_ref, part_ref, *, hr
):
    """v₊ = a − β·v_old − α·v fused with Σ|v₊|² partials (MINRES Lanczos
    orthogonalization + norm in one pass).  Inputs arrive as canonical
    padded-layout windows (same-shape windows — offset windows crash the
    Mosaic backend); body rows are sliced in-kernel, avoiding host-side
    slice copies.  Scalars arrive via SMEM."""
    br = out_ref.shape[0]
    beta = beta_ref[0, 0]
    alpha = alpha_ref[0, 0]
    vn = (
        a_ref[hr : hr + br, :]
        - vold_ref[hr : hr + br, :] * beta
        - v_ref[hr : hr + br, :] * alpha
    )
    out_ref[:, :] = vn
    part_ref[pl.program_id(0), 0] = jnp.sum(vn * vn)


@functools.partial(jax.jit, static_argnames=("hr", "block_rows",))
def fused_orth_norm_call(a2, vold2, v2, beta, alpha, hr, block_rows):
    """Returns (v_new_body, sumsq). a2/vold2/v2 are canonical padded-layout
    vectors ((hr + r_pad + hr, lanes)); output body is (r_pad, lanes)."""
    rows, lanes = a2.shape
    r_pad = rows - 2 * hr
    grid = (r_pad // block_rows,)
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, _I0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec((1, 1), lambda i: (_I0, _I0), memory_space=pltpu.SMEM)
    vn, parts = _pallas_call(
        functools.partial(_orth_norm_kernel, hr=hr),
        grid=grid,
        in_specs=[win, win, win, scal, scal],
        out_specs=(
            body,
            pl.BlockSpec((grid[0], 1), lambda i: (_I0, _I0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), a2.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), a2.dtype),
        ),
    )(a2, vold2, v2, beta.reshape(1, 1), alpha.reshape(1, 1))
    return vn, jnp.sum(parts)
