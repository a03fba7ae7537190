"""Fused Krylov-step kernels for the Jacobi-preconditioned DIA path.

A BiCGStab iteration on the unfused path spends more time in separate
BLAS-1/reduction passes than in its two SpMVs (each dot is an extra full
pass over HBM plus a pipeline flush).  These kernels fuse one preconditioner
apply + one SpMV + the adjacent dot(s) into a single grid pass, reading each
operand from HBM exactly once:

- phase A: y = dinv⊙p,  v = A·y,  r0v = Σ r0·v
- phase B: z = dinv⊙s,  t = A·z,  (tt, ts) = (Σ t·t, Σ t·s)

Both are instances of one kernel parameterized by which dots to take.  The
preconditioner multiply happens on the *window* (body + halo) in VMEM, so the
band shifts read preconditioned values without a second exchange.

Real dtypes only (the complex path composes per plane at a higher level);
used by ``solvers.bicgstab_fused``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv import _band_accumulate, _pallas_call


def _fused_mz_kernel(
    bands_ref, xin_ref, dinv_ref, aux_ref, z_ref, t_ref, part_ref,
    *, offsets, hr, lanes,
):
    """Phase A: z = dinv⊙xin; t = A·z; partial Σ aux·t per grid step."""
    br = z_ref.shape[0]
    z_win = xin_ref[:, :] * dinv_ref[:, :]  # M apply on body+halo window
    acc = _band_accumulate(
        bands_ref, z_win, offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=z_ref.dtype,
    )
    z_ref[:, :] = z_win[hr : hr + br, :]
    t_ref[:, :] = acc
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(aux_ref[hr : hr + br, :] * acc)
    part_ref[i, 1] = jnp.zeros((), acc.dtype)


def _fused_mz_self_kernel(
    bands_ref, xin_ref, dinv_ref, z_ref, t_ref, part_ref,
    *, offsets, hr, lanes,
):
    """Phase B: z = dinv⊙xin; t = A·z; partials (Σ t·t, Σ t·xin_body) — no
    auxiliary vector read (the "aux" variant wasted a full window read)."""
    br = z_ref.shape[0]
    z_win = xin_ref[:, :] * dinv_ref[:, :]
    acc = _band_accumulate(
        bands_ref, z_win, offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=z_ref.dtype,
    )
    z_ref[:, :] = z_win[hr : hr + br, :]
    t_ref[:, :] = acc
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(acc * acc)
    part_ref[i, 1] = jnp.sum(acc * xin_ref[hr : hr + br, :])


def _mz_specs(d, r_pad, hr, lanes, block_rows, n_windows):
    grid = (r_pad // block_rows,)
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, 0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (d, block_rows, lanes), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
    ] + [win] * n_windows
    out_specs = (
        body,  # z body
        body,  # t body
        pl.BlockSpec((grid[0], 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )
    return grid, in_specs, out_specs


@functools.partial(
    jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows", "dots")
)
def fused_mz_call(bands3, xin2, dinv2, aux2, offsets, hr, lanes, block_rows, dots):
    """Returns (z_body, t_body, dot0, dot1) for the fused M+SpMV+dot pass.

    All vectors are full padded-layout ((hr + r_pad + hr, lanes)); offset
    Element windows crash the Mosaic backend, so every window shares one
    shape and body rows are sliced in-kernel.  ``dots="aux"`` reads aux
    (phase A, r0·v); ``dots="self"`` skips the aux read entirely (phase B,
    tt/ts)."""
    d, r_pad, _ = bands3.shape
    out_shape = (
        jax.ShapeDtypeStruct((r_pad, lanes), xin2.dtype),
        jax.ShapeDtypeStruct((r_pad, lanes), xin2.dtype),
        jax.ShapeDtypeStruct(((r_pad // block_rows), 2), xin2.dtype),
    )
    if dots == "aux":
        grid, in_specs, out_specs = _mz_specs(d, r_pad, hr, lanes, block_rows, 3)
        z, t, parts = _pallas_call(
            functools.partial(
                _fused_mz_kernel, offsets=offsets, hr=hr, lanes=lanes
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(bands3, xin2, dinv2, aux2)
    else:
        grid, in_specs, out_specs = _mz_specs(d, r_pad, hr, lanes, block_rows, 2)
        z, t, parts = _pallas_call(
            functools.partial(
                _fused_mz_self_kernel, offsets=offsets, hr=hr, lanes=lanes
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(bands3, xin2, dinv2)
        del aux2
    sums = jnp.sum(parts, axis=0)
    return z, t, sums[0], sums[1]


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
        lambda i: (i * block_rows, 0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    vn, parts = _pallas_call(
        functools.partial(_orth_norm_kernel, hr=hr),
        grid=grid,
        in_specs=[win, win, win, scal, scal],
        out_specs=(
            body,
            pl.BlockSpec((grid[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), a2.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), a2.dtype),
        ),
    )(a2, vold2, v2, beta.reshape(1, 1), alpha.reshape(1, 1))
    return vn, jnp.sum(parts)
