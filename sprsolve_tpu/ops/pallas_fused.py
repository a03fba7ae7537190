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


# --------------------------------------------------------------------------
# Three-kernel BiCGStab step (round-2 redesign).
#
# The round-1 fused path (fused_mz_call) still ran five standalone XLA
# passes per iteration (ρ dot, p-update, s-update, x-update, r-update+norm).
# The redesign folds the *entire* iteration into three kernels — the minimum
# cut, since the two global reductions (α's r0·v and ω's tt/ts) are barriers:
#
#   K_P: p = r + β·(p − ω·v) on the window; v' = A·p; partial r0·v'
#   K_S: s = r − α·v on the window;          t  = A·s; partials t·t, t·s
#   K_T: x' = x − α·dinv⊙p − ω·dinv⊙s; r' = s − ω·t;  partials ‖r'‖², r0·r'
#
# The Jacobi preconditioner is folded into the bands at operator build time
# (right preconditioning: A″ = A·D⁻¹, band d scaled by dinv shifted by its
# offset), so no dinv window is ever read in the SpMV kernels and y/z are
# never materialized; K_T reconstructs the x-direction vectors dinv⊙p and
# dinv⊙s from body-only reads.  ρ for the *next* iteration comes out of K_T,
# eliminating the top-of-loop dot.
# --------------------------------------------------------------------------


def _fused_p_kernel(
    bands_ref, r_ref, p_ref, v_ref, r0_ref, beta_ref, omega_ref,
    p_out, v_out, part_ref, *, offsets, hr, lanes,
):
    """K_P: p-update on the window, SpMV, r0·v partial in one pass."""
    br = p_out.shape[0]
    beta = beta_ref[0, 0]
    omega = omega_ref[0, 0]
    p_win = r_ref[:, :] + beta * (p_ref[:, :] - omega * v_ref[:, :])
    acc = _band_accumulate(
        bands_ref, p_win, offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=p_out.dtype,
    )
    p_out[:, :] = p_win[hr : hr + br, :]
    v_out[:, :] = acc
    part_ref[pl.program_id(0), 0] = jnp.sum(r0_ref[:, :] * acc)


def _fused_s_kernel(
    bands_ref, r_ref, v_ref, alpha_ref, t_out, part_ref, *, offsets, hr, lanes
):
    """K_S: s-update on the window, SpMV, t·t and t·s partials in one pass."""
    br = t_out.shape[0]
    alpha = alpha_ref[0, 0]
    s_win = r_ref[:, :] - alpha * v_ref[:, :]
    acc = _band_accumulate(
        bands_ref, s_win, offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=t_out.dtype,
    )
    t_out[:, :] = acc
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(acc * acc)
    part_ref[i, 1] = jnp.sum(acc * s_win[hr : hr + br, :])


def _fused_tail_kernel(
    x_ref, p_ref, r_ref, v_ref, t_ref, dinv_ref, r0_ref,
    alpha_ref, omega_ref, x_out, r_out, part_ref, *, hr,
):
    """K_T: x/r updates + the two next-iteration reductions.

    p/r/v arrive as the same padded-layout windows the SpMV kernels consume
    (their body rows are sliced in-kernel); x/t/dinv/r0 are body blocks."""
    br = x_out.shape[0]
    alpha = alpha_ref[0, 0]
    omega = omega_ref[0, 0]
    s = r_ref[hr : hr + br, :] - alpha * v_ref[hr : hr + br, :]
    dinv = dinv_ref[:, :]
    x_out[:, :] = (
        x_ref[:, :] - alpha * (dinv * p_ref[hr : hr + br, :]) - omega * (dinv * s)
    )
    rn = s - omega * t_ref[:, :]
    r_out[:, :] = rn
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(rn * rn)
    part_ref[i, 1] = jnp.sum(r0_ref[:, :] * rn)


def _win_body_specs(hr, lanes, block_rows):
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, 0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return win, body, scal


@functools.partial(
    jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows")
)
def fused_p_call(bands3, r2, p2, v2, r0b, beta, omega, offsets, hr, lanes, block_rows):
    """K_P. r2/p2/v2 are full padded-layout; r0b is body-only (r_pad, lanes).
    Returns (p_body, v_body, r0v_partial_sum)."""
    d, r_pad, _ = bands3.shape
    grid = (r_pad // block_rows,)
    win, body, scal = _win_body_specs(hr, lanes, block_rows)
    bspec = pl.BlockSpec(
        (d, block_rows, lanes), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    p_b, v_b, parts = _pallas_call(
        functools.partial(_fused_p_kernel, offsets=offsets, hr=hr, lanes=lanes),
        grid=grid,
        in_specs=[bspec, win, win, win, body, scal, scal],
        out_specs=(
            body,
            body,
            pl.BlockSpec((grid[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), r2.dtype),
            jax.ShapeDtypeStruct((r_pad, lanes), r2.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), r2.dtype),
        ),
    )(bands3, r2, p2, v2, r0b, beta.reshape(1, 1), omega.reshape(1, 1))
    return p_b, v_b, jnp.sum(parts)


@functools.partial(
    jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows")
)
def fused_s_call(bands3, r2, v2, alpha, offsets, hr, lanes, block_rows):
    """K_S. Returns (t_body, tt, ts)."""
    d, r_pad, _ = bands3.shape
    grid = (r_pad // block_rows,)
    win, body, scal = _win_body_specs(hr, lanes, block_rows)
    bspec = pl.BlockSpec(
        (d, block_rows, lanes), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    t_b, parts = _pallas_call(
        functools.partial(_fused_s_kernel, offsets=offsets, hr=hr, lanes=lanes),
        grid=grid,
        in_specs=[bspec, win, win, scal],
        out_specs=(
            body,
            pl.BlockSpec((grid[0], 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), r2.dtype),
            jax.ShapeDtypeStruct((grid[0], 2), r2.dtype),
        ),
    )(bands3, r2, v2, alpha.reshape(1, 1))
    sums = jnp.sum(parts, axis=0)
    return t_b, sums[0], sums[1]


@functools.partial(jax.jit, static_argnames=("hr", "block_rows"))
def fused_tail_call(xb, p2, r2, v2, tb, dinvb, r0b, alpha, omega, hr, block_rows):
    """K_T. xb/tb/dinvb/r0b are body (r_pad, lanes); p2/r2/v2 are full
    padded layout. Returns (x_body, r_body, rnorm2, rho_next)."""
    r_pad, lanes = xb.shape
    grid = (r_pad // block_rows,)
    win, body, scal = _win_body_specs(hr, lanes, block_rows)
    x_b, r_b, parts = _pallas_call(
        functools.partial(_fused_tail_kernel, hr=hr),
        grid=grid,
        in_specs=[body, win, win, win, body, body, body, scal, scal],
        out_specs=(
            body,
            body,
            pl.BlockSpec((grid[0], 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), xb.dtype),
            jax.ShapeDtypeStruct((r_pad, lanes), xb.dtype),
            jax.ShapeDtypeStruct((grid[0], 2), xb.dtype),
        ),
    )(xb, p2, r2, v2, tb, dinvb, r0b, alpha.reshape(1, 1), omega.reshape(1, 1))
    sums = jnp.sum(parts, axis=0)
    return x_b, r_b, sums[0], sums[1]


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
