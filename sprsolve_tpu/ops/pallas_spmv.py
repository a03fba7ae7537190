"""Pallas SpMV kernels — the hot single-chip compute path.

Replaces the role of the reference's native MKL sparse backend
(``src/mkl_mat.rs``): a one-time layout "optimize" step at operator
construction (:class:`PaddedDIA`, the analog of ``mkl_sparse_optimize``,
``src/mkl_mat.rs:112-116``) and a hand-scheduled kernel for the per-iteration
SpMV.

Why a kernel at all: the pure-XLA DIA path re-reads x from HBM once *per
diagonal* (TPU has no general cache between fused operand streams), costing
~(2·D_n)·4 bytes/point.  This kernel stages one x block (plus halo rows) in
VMEM and computes all D_n shifted products from it, reaching the algorithmic
minimum of (D_n + 2)·4 bytes/point — for a 7-point stencil a ~1.6× traffic
reduction, which is the whole game for a bandwidth-bound op.

Layout: vectors are viewed as (rows, LANES), LANES a multiple of the 128
native lane width (autotuned default in this module).  A flat shift `off`
decomposes as q·LANES + r; the shifted read is two lane-rotations
(`pltpu.roll`) of adjacent row windows merged by a lane mask — no gathers
anywhere.

The kernel dtypes are f32/c64 (Mosaic has no f64 lane rotate; x64 fidelity
uses the XLA DIA path).  Complex runs as re/im planes — see the fused
two-plane kernel — since a c64 SpMV is (re·re − im·im, re·im + im·re) over
the same band structure.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.containers import DIA

# autotuned on v5e (tools/tune_kernel2/3.py + /tmp probes, round 2, post
# narrow-band storage and the 64M scoped-vmem budget). Forced-iteration
# rtt-corrected numbers on the 1M-row 7-point Poisson, 4 runs each:
#   lanes=1024 br=128: 360.7 Gnnz/s   e2e bicgstab 84.6 us/it, minres 28.0
#   lanes=1024 br=256: 358.4 Gnnz/s   e2e bicgstab 88.7 us/it, minres 25.8
#   lanes= 512 br=512: 288.8 Gnnz/s   e2e bicgstab 90.8 us/it, minres 28.3
#   lanes= 512 br=768: 253.5 Gnnz/s   (earlier 768 compile failures were the
#                                      16M scoped-vmem limit, not Mosaic)
# 1024-lane rows cut the grid count and the per-row rotate count in half;
# 256-row blocks chosen over 128 for the minres e2e and the complex kernel.
LANES = 1024
BLOCK_ROWS = 256
# the complex two-plane kernel holds ~2x the real kernel's VMEM working set
# (two band planes, two x windows, two outputs). Under the old 16M scoped-
# vmem budget 256-row blocks grazed the limit (16.83M) and 192 was the
# ceiling; with the 64M budget (_pallas_call) the on-chip probes read:
# lanes=512:  192 -> 107.1 Gcnnz/s, 256 -> 130.1, 384 -> 92.9, 512 -> 100.5
# lanes=1024: 128 -> 134.7, 192 -> 111.7, 256 -> 143.8. (1024, 256) wins.
COMPLEX_BLOCK_ROWS = 256

# interpreter-mode flag read at trace time; debug.interpret_kernels toggles it
# (and clears the jit caches) instead of monkey-patching the pallas module.
_INTERPRET = [False]

# strongly-typed zero for BlockSpec index maps: a literal 0 traces as i64
# when the caller enabled jax_enable_x64, and Mosaic cannot legalize the
# resulting mixed (i64, i32, ...) index tuple ("failed to legalize
# 'func.return'"); np.int32 keeps the map i32 under either flag state.
_I0 = np.int32(0)


def _interpret_now() -> bool:
    """Interpret when explicitly requested OR when the default backend has no
    Mosaic lowering (CPU): plain ``solve()`` must work on a CPU-only host
    without the user knowing about interpreter mode.  Read at trace time; the
    backend cannot change after initialization, so cached traces stay valid."""
    return _INTERPRET[0] or jax.default_backend() != "tpu"


def _pallas_call(kernel, **kwargs):
    """Package-local pallas_call: every kernel in this package routes through
    here so the CPU-oracle interpreter mode can be switched on centrally.

    The scoped-VMEM budget is raised from the 16M default to 64M (of the
    chip's 128M): the working set scales with the halo height (hr grows with
    the bandwidth/lanes ratio), and at 10M-row stencils the autotuned 512-row
    block plus double-buffering tips just past 16M — observed as a Mosaic
    "out of memory in memory space vmem" at bench scale, while the same
    kernel at 1M rows fits."""
    interp = _interpret_now()
    if not interp:
        kwargs.setdefault(
            "compiler_params",
            pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )
    return pl.pallas_call(kernel, interpret=interp, **kwargs)


def _band_accumulate(bands_ref, window, *, offsets, hr, lanes, br, dtype):
    """Σ_d bands[d] ⊙ shift(window, off_d) for one row block, all from VMEM.

    ``window`` is the (br + 2·hr, lanes) x window as an array value; a flat
    shift off = q·lanes + r is two lane rotations of adjacent row slices
    merged by a lane mask — no gathers.  Shared by the plain, dotmv and
    fused kernels."""
    acc = jnp.zeros((br, lanes), dtype=dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, lanes), 1)
    for d, off in enumerate(offsets):
        q, r = divmod(off + hr * lanes, lanes)
        if r == 0:
            shifted = window[q : q + br, :]
        else:
            # shifted[j, l] = window[q + j + (l + r >= lanes), (l + r) % lanes]
            # (int32 shift: tpu.dynamic_rotate has no i64 operand form, and a
            # bare Python int traces as i64 when the caller enabled x64)
            sh = np.int32(lanes - r)
            same = pltpu.roll(window[q : q + br, :], sh, 1)
            nxt = pltpu.roll(window[q + 1 : q + br + 1, :], sh, 1)
            shifted = jnp.where(lane < lanes - r, same, nxt)
        band = bands_ref[d]
        if band.dtype != dtype:
            # narrow exact band storage (int8/bf16): widen in VMEM — the
            # HBM→VMEM stream carries the narrow bytes, the FMA runs in the
            # vector dtype, bit-identical because narrowing was lossless
            band = band.astype(dtype)
        acc = acc + band * shifted
    return acc


def _dia_kernel(bands_ref, x_ref, y_ref, *, offsets, hr, lanes):
    """One row-block SpMV: y = A-bands applied to the x window."""
    br = y_ref.shape[0]
    y_ref[:, :] = _band_accumulate(
        bands_ref, x_ref[:, :], offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=y_ref.dtype,
    )


def _dia_dot_kernel(bands_ref, x_ref, y_ref, dot_ref, *, offsets, hr, lanes):
    """SpMV block + per-block xᵀ·(A·x) partial — the fused ``dotmv``.

    Each grid step writes its own partial-sum slot in the whole-buffer SMEM
    output (cross-block read-modify-write accumulation compiles
    pathologically); the partials are summed by XLA outside.  Real dtypes
    only (complex runs per plane and composes the dot at the wrapper).
    """
    br = y_ref.shape[0]
    acc = _band_accumulate(
        bands_ref, x_ref[:, :], offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=y_ref.dtype,
    )
    y_ref[:, :] = acc
    # this block's rows of x sit at window offset hr (x is in VMEM already —
    # the dot costs no extra HBM traffic, exactly like mkl_sparse_?_dotmv)
    dot_ref[pl.program_id(0), 0] = jnp.sum(x_ref[hr : hr + br, :] * acc)


def _dia_wdot_kernel(*refs, offsets, hr, lanes, has_dinv=False, w_is_x=False):
    """SpMV block + per-block partials of wᵀ·(A·x) *and* (A·x)ᵀ·(A·x).

    BiCGStab's two reduction barriers are dots against a vector *other than*
    the SpMV input (r0·v after v = A·y, and t·s / t·t after t = A·z), so the
    plain dotmv form doesn't apply. This kernel takes the extra vector w as a
    window operand and emits both partials while y is still in VMEM — one w
    read (~1 stream) replaces a separate two-stream reduction pass per SpMV.
    With ``has_dinv`` a Jacobi reciprocal window multiplies the x window in
    VMEM first (y = A·(dinv ⊙ x)) — BiCGStab's y/z intermediates never
    round-trip HBM. With ``w_is_x`` (BiCGStab's second half has w = s = the
    SpMV input) the w operand is dropped and the dot reads the already-staged
    raw x window — one whole HBM stream saved, bitwise-identical partials.
    Real dtypes only (complex composes unfused)."""
    refs = list(refs)
    bands_ref = refs.pop(0)
    x_ref = refs.pop(0)
    dinv_ref = refs.pop(0) if has_dinv else None
    w_ref = x_ref if w_is_x else refs.pop(0)
    y_ref, part_ref = refs
    xw = x_ref[:, :] * dinv_ref[:, :] if has_dinv else x_ref[:, :]
    br = y_ref.shape[0]
    acc = _band_accumulate(
        bands_ref, xw, offsets=offsets, hr=hr, lanes=lanes,
        br=br, dtype=y_ref.dtype,
    )
    y_ref[:, :] = acc
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(w_ref[hr : hr + br, :] * acc)
    part_ref[i, 1] = jnp.sum(acc * acc)


@functools.partial(
    jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows", "w_is_x")
)
def _dia_wdot_pallas_call(bands3, x2, w2, offsets, hr, lanes, block_rows,
                          *dinv2, w_is_x=False):
    """One wrapper for both the plain and Jacobi-folded w-dot forms: pass
    the reciprocal window as a trailing positional to enable the fold.
    ``w_is_x=True`` (static) drops the w operand entirely — the dot reads
    the staged x window — saving one full HBM stream per call."""
    has_dinv = bool(dinv2)
    d, r_pad, _ = bands3.shape
    grid = (r_pad // block_rows,)
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, _I0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (d, block_rows, lanes), lambda i: (_I0, i, _I0),
            memory_space=pltpu.VMEM,
        ),
        win,
    ]
    operands = [bands3, x2]
    if has_dinv:
        in_specs.append(win)
        operands.extend(dinv2)
    if not w_is_x:
        in_specs.append(win)
        operands.append(w2)
    y, partials = _pallas_call(
        functools.partial(
            _dia_wdot_kernel, offsets=offsets, hr=hr, lanes=lanes,
            has_dinv=has_dinv, w_is_x=w_is_x,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((grid[0], 2), lambda i: (_I0, _I0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), x2.dtype),
            jax.ShapeDtypeStruct((grid[0], 2), x2.dtype),
        ),
    )(*operands)
    sums = jnp.sum(partials, axis=0)
    return y, sums[0], sums[1]


def _dia_complex_kernel(
    bre_ref, bim_ref, xr_ref, xi_ref, yr_ref, yi_ref, *, offsets, hr, lanes
):
    """Complex SpMV in one pass: both band sets and both x planes staged in
    VMEM once; y_re = A_re·x_re − A_im·x_im, y_im = A_re·x_im + A_im·x_re.
    Half the HBM traffic of four separate real kernel calls."""
    br = yr_ref.shape[0]
    kw = dict(offsets=offsets, hr=hr, lanes=lanes, br=br, dtype=yr_ref.dtype)
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    rr = _band_accumulate(bre_ref, xr, **kw)
    ii = _band_accumulate(bim_ref, xi, **kw)
    ri = _band_accumulate(bre_ref, xi, **kw)
    ir = _band_accumulate(bim_ref, xr, **kw)
    yr_ref[:, :] = rr - ii
    yi_ref[:, :] = ri + ir


def _dia_complex_dot_kernel(
    bre_ref, bim_ref, xr_ref, xi_ref, yr_ref, yi_ref, part_ref,
    *, offsets, hr, lanes, conj_x=False,
):
    """Complex SpMV + per-block partials of conj(x)·(A·x) in one pass.

    dot = Σ conj(x)·y = Σ (xr·yr + xi·yi) + i·(xr·yi − xi·yr); the two real
    partials are accumulated per grid step into disjoint SMEM slots while x
    and y are in VMEM — the two-plane mkl_sparse_?_dotmv analog
    (``src/mkl_mat.rs:242-319``).

    ``conj_x=True`` computes y = A·conj(x) instead (the CS-MINRES Saunders
    step, ``src/cs_minres.rs:99-103``): the conjugation is a sign flip of
    the xi plane folded into the accumulation — no separate conj pass — and
    the SAME partial expressions then equal the Saunders α = conj(x)·y
    (unconjugated product of conj(x) with y)."""
    br = yr_ref.shape[0]
    kw = dict(offsets=offsets, hr=hr, lanes=lanes, br=br, dtype=yr_ref.dtype)
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    rr = _band_accumulate(bre_ref, xr, **kw)
    ii = _band_accumulate(bim_ref, xi, **kw)
    ri = _band_accumulate(bre_ref, xi, **kw)
    ir = _band_accumulate(bim_ref, xr, **kw)
    if conj_x:
        yr = rr + ii
        yi = ir - ri
    else:
        yr = rr - ii
        yi = ri + ir
    yr_ref[:, :] = yr
    yi_ref[:, :] = yi
    xr_b = xr_ref[hr : hr + br, :]
    xi_b = xi_ref[hr : hr + br, :]
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(xr_b * yr + xi_b * yi)
    part_ref[i, 1] = jnp.sum(xr_b * yi - xi_b * yr)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "hr", "lanes", "block_rows", "conj_x"),
)
def _dia_complex_dotmv_pallas_call(
    bre3, bim3, xr2, xi2, offsets, hr, lanes, block_rows, conj_x=False
):
    d, r_pad, _ = bre3.shape
    grid = (r_pad // block_rows,)
    bspec = pl.BlockSpec(
        (d, block_rows, lanes), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
    )
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, _I0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
    )
    yr, yi, parts = _pallas_call(
        functools.partial(
            _dia_complex_dot_kernel, offsets=offsets, hr=hr, lanes=lanes,
            conj_x=conj_x,
        ),
        grid=grid,
        in_specs=[bspec, bspec, win, win],
        out_specs=(
            body,
            body,
            pl.BlockSpec((grid[0], 2), lambda i: (_I0, _I0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
            jax.ShapeDtypeStruct((grid[0], 2), xr2.dtype),
        ),
    )(bre3, bim3, xr2, xi2)
    sums = jnp.sum(parts, axis=0)
    return yr, yi, sums[0], sums[1]


def _dia_complex_wdot_kernel(*refs, offsets, hr, lanes, has_dinv=False,
                             w_is_x=False):
    """Two-plane SpMV + per-block partials of conj(w)·(A·u) and ‖A·u‖².

    The complex mirror of ``_dia_wdot_kernel`` (BiCGStab's two reduction
    barriers ride the SpMV pass).  With ``has_dinv`` the complex Jacobi
    apply u = (dr + i·di) ⊙ x runs in VMEM on the staged windows, so the
    y = M⁻¹p / z = M⁻¹r intermediates never round-trip HBM.  With
    ``w_is_x`` the dot reads the staged raw x planes (w = s = the SpMV
    input), dropping both w streams.  Partials per block:
    [Σ wr·yr + wi·yi, Σ wr·yi − wi·yr, Σ yr² + yi²] = [Re conj(w)·y,
    Im conj(w)·y, conj(y)·y]."""
    refs = list(refs)
    bre_ref = refs.pop(0)
    bim_ref = refs.pop(0)
    xr_ref = refs.pop(0)
    xi_ref = refs.pop(0)
    if has_dinv:
        dr_ref = refs.pop(0)
        di_ref = refs.pop(0)
    if w_is_x:
        wr_ref, wi_ref = xr_ref, xi_ref
    else:
        wr_ref = refs.pop(0)
        wi_ref = refs.pop(0)
    yr_ref, yi_ref, part_ref = refs

    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    if has_dinv:
        dr = dr_ref[:, :]
        di = di_ref[:, :]
        ur = xr * dr - xi * di
        ui = xr * di + xi * dr
    else:
        ur, ui = xr, xi
    br = yr_ref.shape[0]
    kw = dict(offsets=offsets, hr=hr, lanes=lanes, br=br, dtype=yr_ref.dtype)
    rr = _band_accumulate(bre_ref, ur, **kw)
    ii = _band_accumulate(bim_ref, ui, **kw)
    ri = _band_accumulate(bre_ref, ui, **kw)
    ir = _band_accumulate(bim_ref, ur, **kw)
    yr = rr - ii
    yi = ri + ir
    yr_ref[:, :] = yr
    yi_ref[:, :] = yi
    wr_b = wr_ref[hr : hr + br, :]
    wi_b = wi_ref[hr : hr + br, :]
    i = pl.program_id(0)
    part_ref[i, 0] = jnp.sum(wr_b * yr + wi_b * yi)
    part_ref[i, 1] = jnp.sum(wr_b * yi - wi_b * yr)
    part_ref[i, 2] = jnp.sum(yr * yr + yi * yi)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "hr", "lanes", "block_rows", "has_dinv",
                     "w_is_x"),
)
def _dia_complex_wdot_pallas_call(
    bre3, bim3, xr2, xi2, offsets, hr, lanes, block_rows, *extra,
    has_dinv=False, w_is_x=False,
):
    """``extra`` carries, in order: (dr2, di2) when ``has_dinv``, then
    (wr2, wi2) unless ``w_is_x``."""
    d, r_pad, _ = bre3.shape
    grid = (r_pad // block_rows,)
    bspec = pl.BlockSpec(
        (d, block_rows, lanes), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
    )
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, _I0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
    )
    n_extra = (2 if has_dinv else 0) + (0 if w_is_x else 2)
    assert len(extra) == n_extra, (len(extra), has_dinv, w_is_x)
    in_specs = [bspec, bspec, win, win] + [win] * n_extra
    yr, yi, parts = _pallas_call(
        functools.partial(
            _dia_complex_wdot_kernel, offsets=offsets, hr=hr, lanes=lanes,
            has_dinv=has_dinv, w_is_x=w_is_x,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            body,
            body,
            pl.BlockSpec((grid[0], 3), lambda i: (_I0, _I0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
            jax.ShapeDtypeStruct((grid[0], 3), xr2.dtype),
        ),
    )(bre3, bim3, xr2, xi2, *extra)
    sums = jnp.sum(parts, axis=0)
    return yr, yi, sums[0], sums[1], sums[2]


@functools.partial(jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows"))
def _dia_complex_pallas_call(bre3, bim3, xr2, xi2, offsets, hr, lanes, block_rows):
    d, r_pad, _ = bre3.shape
    grid = (r_pad // block_rows,)
    bspec = pl.BlockSpec(
        (d, block_rows, lanes), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
    )
    win = pl.BlockSpec(
        (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
        lambda i: (i * block_rows, _I0),
        memory_space=pltpu.VMEM,
    )
    body = pl.BlockSpec(
        (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
    )
    return _pallas_call(
        functools.partial(_dia_complex_kernel, offsets=offsets, hr=hr, lanes=lanes),
        grid=grid,
        in_specs=[bspec, bspec, win, win],
        out_specs=(body, body),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
            jax.ShapeDtypeStruct((r_pad, lanes), xr2.dtype),
        ),
    )(bre3, bim3, xr2, xi2)


@functools.partial(jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows"))
def _dia_dotmv_pallas_call(bands3, x2, offsets, hr, lanes, block_rows):
    d, r_pad, _ = bands3.shape
    grid = (r_pad // block_rows,)
    y, partials = _pallas_call(
        functools.partial(_dia_dot_kernel, offsets=offsets, hr=hr, lanes=lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (d, block_rows, lanes), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
                lambda i: (i * block_rows, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
            ),
            # whole partials buffer visible to every grid step (block == array
            # dims satisfies the tiling constraint); steps write disjoint slots
            pl.BlockSpec(
                (grid[0], 1), lambda i: (_I0, _I0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, lanes), x2.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), x2.dtype),
        ),
    )(bands3, x2)
    return y, jnp.sum(partials).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("offsets", "hr", "lanes", "block_rows"))
def _dia_pallas_call(bands3, x2, offsets, hr, lanes, block_rows):
    d, r_pad, _ = bands3.shape
    grid = (r_pad // block_rows,)
    return _pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, hr=hr, lanes=lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (d, block_rows, lanes),
                lambda i: (_I0, i, _I0),
                memory_space=pltpu.VMEM,
            ),
            # overlapping x windows: block i covers padded rows
            # [i·BR, i·BR + BR + 2·hr) — elementwise row indexing (pl.Element)
            # because consecutive windows overlap by 2·hr rows.
            pl.BlockSpec(
                (pl.Element(block_rows + 2 * hr), pl.Element(lanes)),
                lambda i: (i * block_rows, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, lanes), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, lanes), x2.dtype),
    )(bands3, x2)


@dataclasses.dataclass(frozen=True)
class PaddedDIA:
    """DIA re-laid-out for the Pallas kernel (built once per operator).

    ``bands3`` is (D, R_pad, LANES); vectors live in the padded 2-D layout
    (HR + R_pad + HR, LANES) with zero halo rows, so the whole Krylov solve
    can run in kernel layout with zero per-iteration conversion: every vecalg
    op is elementwise/reduction and shape-agnostic, and zeros in the halo are
    preserved by all of them.
    """

    # BiCGStab compiles its ρ-restart as a nested-loop exit for kernel
    # operators (removes per-iteration vector copies; see solvers/bicgstab)
    _prefers_nested_restart = True

    bands3: jax.Array         # possibly narrow storage — see ``vdtype``
    offsets: Tuple[int, ...]
    n: int                    # logical length
    hr: int                   # halo rows on each side
    shape: Tuple[int, int]
    lanes: int = LANES
    block_rows: int = BLOCK_ROWS
    vdtype: str = "float32"   # compute dtype; bands3 may be stored narrower

    @property
    def dtype(self):
        return jnp.dtype(self.vdtype)

    @property
    def r_pad(self) -> int:
        return self.bands3.shape[1]

    @staticmethod
    def _narrow_bands(bands3: np.ndarray) -> np.ndarray:
        """Narrowest storage that represents every band value EXACTLY.

        Band traffic dominates a stencil SpMV (D of the D+2 streams);
        stencil/FEM matrices routinely have small-integer or low-precision
        coefficients, so storing them as int8 (4×) or bfloat16 (2×) and
        widening in VMEM cuts the kernel's HBM bytes with bit-identical
        results. Never lossy: any band set that doesn't round-trip stays f32.
        """
        if bands3.dtype != np.float32 or bands3.size == 0:
            return bands3
        amax = float(np.abs(bands3).max()) if bands3.size else 0.0
        if amax <= 127 and np.all(bands3 == np.round(bands3)):
            return bands3.astype(np.int8)
        import ml_dtypes

        bf = bands3.astype(ml_dtypes.bfloat16)
        if np.array_equal(np.asarray(bf, dtype=np.float32), bands3):
            return bf
        return bands3

    @staticmethod
    def _fit_block_rows(block_rows, nbands, lanes, hr, band_isz):
        """Shrink block_rows until the per-block VMEM working set fits the
        64M scoped budget: ~2× double-buffered band blocks at their STORED
        (possibly narrowed) width + the x window + y.  Wide-band matrices
        (e.g. 32 unnarrowable f32 bands at 1M rows) used to compile-fail
        with a scoped-vmem OOM at the shipped (1024, 256) geometry — found
        by the round-5 hybrid bench before its band floor existed; a
        legitimately wide band hits the same wall, so the geometry must
        adapt rather than the kernel erroring out."""
        budget = 52 * 1024 * 1024   # margin under the 64M scoped limit
        br = int(block_rows)
        while br > 8:
            staged = (
                2 * nbands * br * lanes * band_isz      # band blocks (dbuf)
                + 2 * (br + 2 * hr) * lanes * 4          # x window (dbuf)
                + br * lanes * 4                         # y block
            )
            if staged <= budget:
                break
            br //= 2
        return max(br, 8)

    @staticmethod
    def from_dia(
        m: DIA,
        lanes: int = None,
        block_rows: int = None,
        narrow: bool = True,
    ) -> "PaddedDIA":
        # geometry resolution: explicit argument > persisted autotune cache
        # (utils.tuning — the mkl_sparse_optimize analog, one sweep per
        # shape class) > shipped v5e defaults
        if lanes is None or block_rows is None:
            from ..utils.tuning import lookup as _tuned

            cfg = _tuned(
                "dia", np.asarray(m.bands).dtype, len(m.offsets), m.shape[0]
            )
            if lanes is None:
                lanes = (cfg or {}).get("lanes", LANES)
            if block_rows is None:
                block_rows = (cfg or {}).get("block_rows", BLOCK_ROWS)
        n = m.shape[0]
        h = max((abs(o) for o in m.offsets), default=0)
        # round halo rows to a multiple of 8: window heights (BR + 2·hr) and
        # Element row starts (hr + i·BR) must both stay 8-aligned for Mosaic
        hr = -(-(-(-h // lanes)) // 8) * 8 if h else 0
        r = -(-n // lanes)
        r_pad = -(-r // block_rows) * block_rows
        bands = np.asarray(m.bands)
        pad = r_pad * lanes - n
        bands3 = np.pad(bands, ((0, 0), (0, pad))).reshape(
            bands.shape[0], r_pad, lanes
        )
        if narrow:
            bands3 = PaddedDIA._narrow_bands(bands3)
        block_rows = PaddedDIA._fit_block_rows(
            block_rows, bands.shape[0], lanes, hr,
            np.dtype(bands3.dtype).itemsize,
        )
        return PaddedDIA(
            bands3=jnp.asarray(bands3),
            offsets=m.offsets,
            n=n,
            hr=hr,
            shape=m.shape,
            lanes=lanes,
            block_rows=block_rows,
            vdtype=str(np.asarray(m.bands).dtype),
        )

    # --- padded-layout vector helpers -------------------------------------
    def pad_vec(self, x: jax.Array) -> jax.Array:
        """(n,) → (HR + R_pad + HR, LANES) with zero halo+tail."""
        flat = jnp.zeros(self.r_pad * self.lanes, dtype=x.dtype).at[: self.n].set(x)
        body = flat.reshape(self.r_pad, self.lanes)
        halo = jnp.zeros((self.hr, self.lanes), dtype=x.dtype)
        return jnp.concatenate([halo, body, halo], axis=0)

    def unpad_vec(self, x2: jax.Array) -> jax.Array:
        return x2[self.hr : self.hr + self.r_pad].reshape(-1)[: self.n]

    # --- operator protocol -------------------------------------------------
    def _matvec_real(self, x2: jax.Array) -> jax.Array:
        y_body = _dia_pallas_call(
            self.bands3, x2, self.offsets, self.hr, self.lanes, self.block_rows
        )
        halo = jnp.zeros((self.hr, self.lanes), dtype=x2.dtype)
        return jnp.concatenate([halo, y_body, halo], axis=0)

    def matvec(self, x2: jax.Array) -> jax.Array:
        """SpMV in padded 2-D layout: x2 and the result are (HR+R_pad+HR, LANES)."""
        if jnp.iscomplexobj(x2):
            xr, xi = jnp.real(x2), jnp.imag(x2)
            if jnp.iscomplexobj(self.bands3):
                raise NotImplementedError(
                    "complex bands: use the ComplexPaddedDIA wrapper"
                )
            return (self._matvec_real(xr) + 1j * self._matvec_real(xi)).astype(
                x2.dtype
            )
        return self._matvec_real(x2)

    def matvec_dot(self, x2: jax.Array):
        """Fused SpMV + conj(x)·(A·x) — the ``mkl_sparse_?_dotmv`` analog
        (``src/mkl_mat.rs:242-319``): the dot reads x and y while they are
        already in VMEM, costing no extra HBM traffic. Real dtypes run the
        fused kernel; complex composes per re/im plane."""
        from ..vecalg import conj_dot

        if jnp.iscomplexobj(x2):
            y = self.matvec(x2)
            return y, conj_dot(x2, y)
        y_body, dot = _dia_dotmv_pallas_call(
            self.bands3, x2, self.offsets, self.hr, self.lanes, self.block_rows
        )
        halo = jnp.zeros((self.hr, self.lanes), dtype=x2.dtype)
        y = jnp.concatenate([halo, y_body, halo], axis=0)
        return y, dot[0, 0]

    def matvec_wdot(self, x2: jax.Array, w2: jax.Array):
        """Fused SpMV + dots against a *different* vector w: returns
        (A·x, conj(w)·(A·x), conj(A·x)·(A·x)) with both reductions taken
        while the output block is in VMEM. Covers BiCGStab's r0·v and
        t·s / t·t barriers (``src/bicg_stab.rs:128,163,178,183``), which the
        dotmv form cannot. Real dtypes only."""
        if jnp.iscomplexobj(x2) or jnp.iscomplexobj(self.bands3):
            from ..vecalg import conj_dot

            y = self.matvec(x2)
            return y, conj_dot(w2, y), conj_dot(y, y)
        y_body, wd, yd = _dia_wdot_pallas_call(
            self.bands3, x2, w2, self.offsets, self.hr, self.lanes,
            self.block_rows, w_is_x=w2 is x2,
        )
        halo = jnp.zeros((self.hr, self.lanes), dtype=x2.dtype)
        y = jnp.concatenate([halo, y_body, halo], axis=0)
        return y, wd, yd

    def matvec_wdot_prec(self, x2: jax.Array, w2: jax.Array,
                         dinv2: jax.Array):
        """Jacobi-folded w-dot: (A·(dinv ⊙ x), conj(w)·y, conj(y)·y).

        The diagonal-preconditioner apply runs in VMEM on the staged x
        window, so BiCGStab's y = M⁻¹p / z = M⁻¹r intermediates never
        round-trip HBM (two full vector passes per iteration saved for one
        extra window stream). Real dtypes only."""
        if jnp.iscomplexobj(x2) or jnp.iscomplexobj(self.bands3):
            from ..vecalg import conj_dot

            u = x2 * dinv2
            y = self.matvec(u)
            return y, conj_dot(w2, y), conj_dot(y, y)
        y_body, wd, yd = _dia_wdot_pallas_call(
            self.bands3, x2, w2, self.offsets, self.hr, self.lanes,
            self.block_rows, dinv2, w_is_x=w2 is x2,
        )
        halo = jnp.zeros((self.hr, self.lanes), dtype=x2.dtype)
        y = jnp.concatenate([halo, y_body, halo], axis=0)
        return y, wd, yd

    def diagonal_padded(self) -> jax.Array:
        if 0 in self.offsets:
            body = self.bands3[self.offsets.index(0)].astype(self.dtype)
        else:
            body = jnp.zeros((self.r_pad, self.lanes), self.dtype)
        halo = jnp.zeros((self.hr, self.lanes), dtype=self.dtype)
        return jnp.concatenate([halo, body, halo], axis=0)

    def orth_norm(self, a2, vold2, v2, beta, alpha):
        """Fused Lanczos orthogonalization + squared norm (real dtypes):
        v₊ = a − β·v_old − α·v and Σ|v₊|² in one pass over the body rows
        (halo rows are zero on all inputs and stay zero). Returns
        (v₊ padded, local sum of squares)."""
        from .pallas_fused import fused_orth_norm_call

        vn_body, sumsq = fused_orth_norm_call(
            a2,
            vold2,
            v2,
            jnp.asarray(beta, a2.dtype),
            jnp.asarray(alpha, a2.dtype),
            self.hr,
            self.block_rows,
        )
        halo = jnp.zeros((self.hr, self.lanes), dtype=a2.dtype)
        return jnp.concatenate([halo, vn_body, halo], axis=0), sumsq

    def jacobi_precond(self):
        """Diagonal preconditioner in padded layout.

        Halo/pad coordinates have a structurally-zero diagonal; their
        reciprocal is forced to 1 so they stay inert (their residual is
        always exactly 0, so multiplying by 1 preserves the zeros)."""
        from ..precond import DiagPrecond

        d = self.diagonal_padded()
        safe = jnp.where(d == 0, jnp.ones((), d.dtype), d)
        return DiagPrecond(diag_inv=jnp.ones((), d.dtype) / safe)

    def relay_diag_precond(self, M):
        """Re-lay a flat-layout DiagPrecond into the padded layout (zero pads
        keep pad coordinates inert)."""
        from ..precond import DiagPrecond

        if jnp.iscomplexobj(M.diag_inv):
            raise NotImplementedError(
                "complex diagonal preconditioner on a real operator"
            )
        return DiagPrecond(diag_inv=self.pad_vec(M.diag_inv))


jax.tree_util.register_dataclass(
    PaddedDIA,
    data_fields=("bands3",),
    meta_fields=("offsets", "n", "hr", "shape", "lanes", "block_rows", "vdtype"),
)


@dataclasses.dataclass(frozen=True)
class ComplexPaddedDIA:
    """Complex-banded operator over the real Pallas kernel.

    A complex SpMV decomposes into four real band products over the same
    structure: y_re = A_re·x_re − A_im·x_im, y_im = A_re·x_im + A_im·x_re.
    Vectors stay complex in the padded 2-D layout; the kernel sees re/im
    planes (Pallas TPU has no native complex path — SURVEY.md §7
    "Complex support in Pallas").
    """

    _prefers_nested_restart = True

    re: PaddedDIA
    im: PaddedDIA

    @property
    def shape(self):
        return self.re.shape

    @property
    def n(self):
        return self.re.n

    @property
    def hr(self):
        return self.re.hr

    @property
    def lanes(self):
        return self.re.lanes

    @property
    def r_pad(self):
        return self.re.r_pad

    @staticmethod
    def from_dia(m: DIA, lanes: int = None, block_rows: int = None):
        if lanes is None or block_rows is None:
            from ..utils.tuning import lookup as _tuned

            cfg = _tuned(
                "cdia", np.asarray(m.bands).dtype, len(m.offsets), m.shape[0]
            )
            if lanes is None:
                lanes = (cfg or {}).get("lanes", LANES)
            if block_rows is None:
                block_rows = (cfg or {}).get("block_rows", COMPLEX_BLOCK_ROWS)
        bands = np.asarray(m.bands)
        mk = lambda b, br: PaddedDIA.from_dia(
            DIA(bands=b, offsets=m.offsets, shape=m.shape),
            lanes=lanes,
            block_rows=br,
        )
        re = mk(bands.real, block_rows)
        im = mk(bands.imag, block_rows)
        # the two-plane kernel stages BOTH planes at once (~2× the real
        # kernel's working set) and needs matching geometry; re-fit a
        # shared block_rows for the combined budget (each plane may have
        # narrowed to a different stored width)
        isz = max(
            np.dtype(np.asarray(re.bands3).dtype).itemsize,
            np.dtype(np.asarray(im.bands3).dtype).itemsize,
        )
        br_fit = PaddedDIA._fit_block_rows(
            min(re.block_rows, im.block_rows),
            2 * len(m.offsets), lanes, re.hr, isz,
        )
        if br_fit != re.block_rows or br_fit != im.block_rows:
            re = mk(bands.real, br_fit)
            im = mk(bands.imag, br_fit)
        return ComplexPaddedDIA(re=re, im=im)

    @staticmethod
    def from_csr(m, lanes: int = None, block_rows: int = None):
        """Build directly from a host CSR: complex data never touches the
        device (only the real band planes do) — required on backends without
        complex device-buffer support."""
        from ..sparse.containers import DIA as _DIA

        bands, offsets = _DIA.arrays_from_csr(m)
        if lanes is None or block_rows is None:
            from ..utils.tuning import lookup as _tuned

            cfg = _tuned("cdia", bands.dtype, len(offsets), m.shape[0])
            if lanes is None:
                lanes = (cfg or {}).get("lanes", LANES)
            if block_rows is None:
                block_rows = (cfg or {}).get("block_rows", COMPLEX_BLOCK_ROWS)
        mk = lambda b: PaddedDIA.from_dia(
            _DIA(bands=b, offsets=offsets, shape=m.shape),
            lanes=lanes,
            block_rows=block_rows,
        )
        return ComplexPaddedDIA(re=mk(bands.real), im=mk(bands.imag))

    def pad_vec(self, x: jax.Array) -> jax.Array:
        return self.re.pad_vec(jnp.real(x)) + 1j * self.re.pad_vec(jnp.imag(x))

    def unpad_vec(self, x2: jax.Array) -> jax.Array:
        return self.re.unpad_vec(jnp.real(x2)) + 1j * self.re.unpad_vec(
            jnp.imag(x2)
        )

    def matvec(self, x2: jax.Array) -> jax.Array:
        # single fused two-plane kernel: both band sets + both x planes are
        # staged in VMEM once (half the traffic of four real kernel calls)
        p = self.re
        yr_body, yi_body = _dia_complex_pallas_call(
            p.bands3, self.im.bands3, jnp.real(x2), jnp.imag(x2),
            p.offsets, p.hr, p.lanes, p.block_rows,
        )
        halo = jnp.zeros((p.hr, p.lanes), dtype=yr_body.dtype)
        yr = jnp.concatenate([halo, yr_body, halo], axis=0)
        yi = jnp.concatenate([halo, yi_body, halo], axis=0)
        return (yr + 1j * yi).astype(x2.dtype)

    def matvec_dot(self, x2: jax.Array):
        """Fused two-plane SpMV + conj(x)·(A·x): the dot partials are taken
        in-kernel while both planes are in VMEM (no extra HBM pass), unlike
        composing matvec with a separate conj_dot."""
        p = self.re
        yr_body, yi_body, dre, dim = _dia_complex_dotmv_pallas_call(
            p.bands3, self.im.bands3, jnp.real(x2), jnp.imag(x2),
            p.offsets, p.hr, p.lanes, p.block_rows,
        )
        halo = jnp.zeros((p.hr, p.lanes), dtype=yr_body.dtype)
        yr = jnp.concatenate([halo, yr_body, halo], axis=0)
        yi = jnp.concatenate([halo, yi_body, halo], axis=0)
        y = (yr + 1j * yi).astype(x2.dtype)
        return y, (dre + 1j * dim).astype(x2.dtype)

    def _wdot_call(self, x2, w2, dinv_planes):
        """Shared driver for the fused complex w-dot forms."""
        p = self.re
        w_is_x = w2 is x2
        extra = tuple(dinv_planes)
        if not w_is_x:
            extra = extra + (jnp.real(w2), jnp.imag(w2))
        yr_body, yi_body, wdr, wdi, yd = _dia_complex_wdot_pallas_call(
            p.bands3, self.im.bands3, jnp.real(x2), jnp.imag(x2),
            p.offsets, p.hr, p.lanes, p.block_rows, *extra,
            has_dinv=bool(dinv_planes), w_is_x=w_is_x,
        )
        halo = jnp.zeros((p.hr, p.lanes), dtype=yr_body.dtype)
        yr = jnp.concatenate([halo, yr_body, halo], axis=0)
        yi = jnp.concatenate([halo, yi_body, halo], axis=0)
        y = (yr + 1j * yi).astype(x2.dtype)
        return y, (wdr + 1j * wdi).astype(x2.dtype), yd.astype(x2.dtype)

    def matvec_wdot(self, x2: jax.Array, w2: jax.Array):
        """Fused two-plane SpMV + (conj(w)·(A·x), ‖A·x‖²) — the complex
        mirror of ``PaddedDIA.matvec_wdot`` (BiCGStab's reduction barriers
        ride the SpMV pass; both w streams dropped when w is x)."""
        return self._wdot_call(x2, w2, ())

    def matvec_wdot_cprec(self, x2: jax.Array, w2: jax.Array,
                          inv_re: jax.Array, inv_im: jax.Array):
        """Complex-Jacobi-folded w-dot: u = (inv_re + i·inv_im) ⊙ x runs in
        VMEM on the staged windows, then (A·u, conj(w)·A·u, ‖A·u‖²) in the
        same pass — BiCGStab's y/z intermediates never round-trip HBM."""
        return self._wdot_call(x2, w2, (inv_re, inv_im))

    def matvec_conj_dot(self, x2: jax.Array):
        """Fused (A·conj(x), conj(x)·(A·conj(x))) — the CS-MINRES Saunders
        step in one kernel pass: the conjugation is a sign fold in VMEM, so
        the separate conj pass and dot pass both disappear."""
        p = self.re
        yr_body, yi_body, dre, dim = _dia_complex_dotmv_pallas_call(
            p.bands3, self.im.bands3, jnp.real(x2), jnp.imag(x2),
            p.offsets, p.hr, p.lanes, p.block_rows, conj_x=True,
        )
        halo = jnp.zeros((p.hr, p.lanes), dtype=yr_body.dtype)
        yr = jnp.concatenate([halo, yr_body, halo], axis=0)
        yi = jnp.concatenate([halo, yi_body, halo], axis=0)
        y = (yr + 1j * yi).astype(x2.dtype)
        return y, (dre + 1j * dim).astype(x2.dtype)

    def diagonal_padded(self) -> jax.Array:
        return self.re.diagonal_padded() + 1j * self.im.diagonal_padded()

    def jacobi_precond(self):
        """Complex Jacobi preconditioner in padded layout, as re/im planes
        (no complex array is ever materialized outside a compiled program).

        Pad/halo slots have a structurally zero diagonal; their reciprocal is
        forced to 1 + 0i so they stay inert (their residual is exactly 0)."""
        from ..precond import ComplexDiagPrecond

        dr = self.re.diagonal_padded()
        di = self.im.diagonal_padded()
        denom = dr * dr + di * di
        one = jnp.ones((), dr.dtype)
        safe = jnp.where(denom == 0, one, denom)
        inv_re = jnp.where(denom == 0, one, dr) / safe
        inv_im = jnp.where(denom == 0, jnp.zeros((), dr.dtype), -di) / safe
        return ComplexDiagPrecond(inv_re=inv_re, inv_im=inv_im)

    def relay_diag_precond(self, M):
        """Re-lay a flat DiagPrecond into padded layout, splitting complex
        diagonals into re/im planes (no complex array crosses any device
        boundary — the axon backend rejects complex buffers)."""
        import numpy as np

        from ..precond import ComplexDiagPrecond, DiagPrecond

        di = np.asarray(M.diag_inv)
        if np.iscomplexobj(di):
            rdt = di.real.dtype
            return ComplexDiagPrecond(
                inv_re=self.re.pad_vec(jnp.asarray(di.real.astype(rdt))),
                inv_im=self.re.pad_vec(jnp.asarray(di.imag.astype(rdt))),
            )
        # real diagonal on a complex system (reference src/precond.rs:6-13)
        return DiagPrecond(diag_inv=self.re.pad_vec(jnp.asarray(di)))


jax.tree_util.register_dataclass(
    ComplexPaddedDIA, data_fields=("re", "im"), meta_fields=()
)


def spmv_dia_pallas(m: DIA, x: jax.Array) -> jax.Array:
    """Convenience flat-vector entry (converts layout per call — for
    validation; production solvers should hold a PaddedDIA and padded
    vectors)."""
    p = PaddedDIA.from_dia(m)
    return p.unpad_vec(p.matvec(p.pad_vec(x)))
