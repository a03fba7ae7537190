"""Distributed Pallas operator: per-shard DIA kernel + ppermute halo exchange.

This unifies the two halves of the scaling story (BASELINE.md config #5):
the single-chip Pallas stencil kernel already consumes an x window with halo
rows staged in VMEM; across chips, those same halo rows are exactly the
neighbor shard's boundary rows.  So the distributed matvec is:

    top    = ppermute(body[-hr:],  i → i+1)      # left neighbor's tail
    bottom = ppermute(body[:hr],   i → i-1)      # right neighbor's head
    x_ext  = concat([top, body, bottom])         # kernel-ready window
    y      = pallas_dia_kernel(bands_local, x_ext)

The two ppermutes are independent of the bands loads and of each other, so
XLA overlaps them with the kernel's first block DMAs — the local/remote
overlap BASELINE asks for falls out of the data flow rather than manual
scheduling.

Vector layout in distributed mode: (r_local, LANES) row blocks per device
(global (D·r_local, LANES) sharded on rows), no persistent halo storage —
halos exist only transiently inside matvec.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops.pallas_spmv import (
    BLOCK_ROWS,
    COMPLEX_BLOCK_ROWS,
    LANES,
    PaddedDIA,
    _dia_complex_dotmv_pallas_call,
    _dia_complex_pallas_call,
    _dia_dotmv_pallas_call,
    _dia_pallas_call,
    _dia_wdot_pallas_call,
)
from ..sparse.containers import DIA


@dataclasses.dataclass(frozen=True)
class DistPaddedDIA:
    """Row-sharded banded operator executing the Pallas DIA kernel per shard."""

    _prefers_nested_restart = True  # see solvers/bicgstab.py

    bands3: jax.Array          # (D_diags, D*r_local, LANES) global / (D_diags, r_local, LANES) local
    offsets: Tuple[int, ...]
    n: int                     # logical system size
    hr: int                    # halo rows
    r_local: int               # rows per device
    shape: Tuple[int, int]
    axis_name: str
    lanes: int = LANES
    block_rows: int = BLOCK_ROWS
    vdtype: str = "float32"    # compute dtype; bands3 may be stored narrower

    @property
    def dtype(self):
        return jnp.dtype(self.vdtype)

    def pspec(self, axis_name=None) -> "DistPaddedDIA":
        a = axis_name or self.axis_name
        return dataclasses.replace(self, bands3=P(None, a, None))

    # ---- host-side layout helpers (global, before sharding) ----------------
    def pad_vec(self, x: jax.Array) -> jax.Array:
        """(n,) → (D·r_local, LANES): flat zero-pad then 2-D view. No halo."""
        total = self.bands3.shape[1] * self.lanes
        flat = jnp.zeros(total, dtype=x.dtype).at[: self.n].set(x)
        return flat.reshape(-1, self.lanes)

    def unpad_vec(self, x2: jax.Array) -> jax.Array:
        return x2.reshape(-1)[: self.n]

    @staticmethod
    def from_dia(
        m: DIA,
        n_devices: int,
        axis_name: str = "rows",
        lanes: int = LANES,
        block_rows: int = BLOCK_ROWS,
    ) -> "DistPaddedDIA":
        n = m.shape[0]
        h = max((abs(o) for o in m.offsets), default=0)
        hr = -(-(-(-h // lanes)) // 8) * 8 if h else 0
        # rows per device: multiple of block_rows, covering n, halo must fit
        r_local = -(-(-(-n // lanes)) // (n_devices * block_rows)) * block_rows
        if hr > r_local:
            raise ValueError(
                f"halo rows {hr} exceed rows-per-device {r_local}; "
                "fewer devices or wider lanes required"
            )
        r_total = r_local * n_devices
        bands = np.asarray(m.bands)
        pad = r_total * lanes - n
        bands3 = np.pad(bands, ((0, 0), (0, pad))).reshape(
            bands.shape[0], r_total, lanes
        )
        bands3 = PaddedDIA._narrow_bands(bands3)
        return DistPaddedDIA(
            bands3=jnp.asarray(bands3),
            offsets=m.offsets,
            n=n,
            hr=hr,
            r_local=r_local,
            shape=(r_total * lanes, r_total * lanes),
            axis_name=axis_name,
            lanes=lanes,
            block_rows=block_rows,
            vdtype=str(np.asarray(m.bands).dtype),
        )

    # ---- distributed matvec (inside shard_map) -----------------------------
    def _exchange_halo(self, body: jax.Array) -> jax.Array:
        """Build the kernel-ready (hr + r_local + hr, lanes) x window.

        The two ppermutes are independent of each other and of the band
        loads, so XLA overlaps them with the kernel's first block DMAs."""
        ax = self.axis_name
        nd = lax.axis_size(ax)
        hr = self.hr
        if hr == 0:  # diagonal-only operator: no neighbor coupling
            return body
        # halo exchange: device i's top halo rows are the left neighbor's
        # tail, bottom halo rows the right neighbor's head. Unmatched
        # edges → zeros (the global boundary condition, matching the zero
        # band padding).
        top = lax.ppermute(
            body[self.r_local - hr :], ax, perm=[(i, i + 1) for i in range(nd - 1)]
        )
        bottom = lax.ppermute(
            body[:hr], ax, perm=[(i + 1, i) for i in range(nd - 1)]
        )
        return jnp.concatenate([top, body, bottom], axis=0)

    def _zero_halo_ext(self, v: jax.Array) -> jax.Array:
        """(r_local, lanes) → kernel window shape with ZERO halo rows —
        for operands whose dots only read body rows (the w vectors of the
        fused w-dot kernels), which need no neighbor exchange."""
        if self.hr == 0:
            return v
        zh = jnp.zeros((self.hr, self.lanes), v.dtype)
        return jnp.concatenate([zh, v, zh], axis=0)

    def matvec(self, body: jax.Array) -> jax.Array:
        return _dia_pallas_call(
            self.bands3,
            self._exchange_halo(body),
            self.offsets,
            self.hr,
            self.lanes,
            self.block_rows,
        )

    def matvec_dot(self, body: jax.Array):
        """Fused SpMV + local partial of conj(x)·(A·x), matching the
        single-chip ``PaddedDIA.matvec_dot`` structure: the dot reads x and
        y while they are in VMEM (no extra HBM pass). Solvers psum the
        returned partial over the row axis."""
        y, dot = _dia_dotmv_pallas_call(
            self.bands3,
            self._exchange_halo(body),
            self.offsets,
            self.hr,
            self.lanes,
            self.block_rows,
        )
        return y, dot[0, 0]

    def matvec_wdot(self, body: jax.Array, w_body: jax.Array):
        """Fused SpMV + local partials of conj(w)·(A·x) and ‖A·x‖², the
        distributed mirror of ``PaddedDIA.matvec_wdot`` (BiCGStab's
        reduction barriers). w needs no halo exchange — the dots only read
        body rows — so it enters the kernel with zero halo rows; the solver
        psums the partials over the row axis via ``mv_wdot``'s axis_name."""
        # w = x dedup (BiCGStab's second half passes w = s = the SpMV
        # input): the dot reads the staged x window's body rows — which ARE
        # w, halo exchange or not — skipping the whole w stream.
        if w_body is body:
            return _dia_wdot_pallas_call(
                self.bands3,
                self._exchange_halo(body),
                body,
                self.offsets,
                self.hr,
                self.lanes,
                self.block_rows,
                w_is_x=True,
            )
        return _dia_wdot_pallas_call(
            self.bands3,
            self._exchange_halo(body),
            self._zero_halo_ext(w_body),
            self.offsets,
            self.hr,
            self.lanes,
            self.block_rows,
        )

    # NOTE: no matvec_wdot_prec mirror here on purpose — folding the
    # Jacobi apply into the kernel input would require a halo exchange of
    # dinv per call (collectives are not hoisted out of while_loops), i.e.
    # double the per-iteration ppermute count for a ~one-pass saving. The
    # composed path (exchange u = M⁻¹x, one collective) is optimal here.

    def orth_norm(self, a, vold, v, beta, alpha):
        """Fused Lanczos orthogonalization + local Σ|v₊|² partial, the
        distributed mirror of ``PaddedDIA.orth_norm``. Vectors here are halo-
        free (r_local, lanes) bodies, so the kernel runs with hr=0; the
        caller (MINRES with ``axis_name``) psums the partial."""
        from ..ops.pallas_fused import fused_orth_norm_call

        vn, sumsq = fused_orth_norm_call(
            a,
            vold,
            v,
            jnp.asarray(beta, a.dtype),
            jnp.asarray(alpha, a.dtype),
            0,
            self.block_rows,
        )
        return vn, sumsq

    def diagonal_global(self) -> jax.Array:
        """Global (D·r_local, LANES) diagonal (for preconditioner setup)."""
        if 0 in self.offsets:
            return self.bands3[self.offsets.index(0)].astype(self.dtype)
        return jnp.zeros(self.bands3.shape[1:], self.dtype)


jax.tree_util.register_dataclass(
    DistPaddedDIA,
    data_fields=("bands3",),
    meta_fields=(
        "offsets",
        "n",
        "hr",
        "r_local",
        "shape",
        "axis_name",
        "lanes",
        "block_rows",
        "vdtype",
    ),
)


@dataclasses.dataclass(frozen=True)
class DistComplexPaddedDIA:
    """Row-sharded complex-banded operator: the fused two-plane Pallas
    kernel per shard, fed by the same ppermute halo exchange as
    :class:`DistPaddedDIA` (one exchange per re/im plane).

    Closes the complex × distributed cell of the capability matrix: complex
    Krylov solves (planes-BiCGStab, CS-MINRES incl. the preconditioned
    Saunders form) run row-partitioned over a mesh with the single-chip
    kernel structure intact — fused SpMV+dot per shard, psum'd partials.
    Pytree leaves are the two real band planes (axon/complex-buffer-safe);
    vectors are complex inside shard_map.
    """

    _prefers_nested_restart = True  # see solvers/bicgstab.py

    re: DistPaddedDIA
    im: DistPaddedDIA

    @property
    def shape(self):
        return self.re.shape

    @property
    def n(self):
        return self.re.n

    @property
    def dtype(self):
        return jnp.dtype(jnp.result_type(self.re.dtype, jnp.complex64))

    @property
    def axis_name(self):
        return self.re.axis_name

    def pspec(self, axis_name=None) -> "DistComplexPaddedDIA":
        return DistComplexPaddedDIA(
            re=self.re.pspec(axis_name), im=self.im.pspec(axis_name)
        )

    @staticmethod
    def from_dia(
        m: DIA,
        n_devices: int,
        axis_name: str = "rows",
        lanes: int = LANES,
        block_rows: int = COMPLEX_BLOCK_ROWS,
    ) -> "DistComplexPaddedDIA":
        bands = np.asarray(m.bands)
        mk = lambda b: DistPaddedDIA.from_dia(
            DIA(bands=b, offsets=m.offsets, shape=m.shape),
            n_devices, axis_name=axis_name, lanes=lanes, block_rows=block_rows,
        )
        return DistComplexPaddedDIA(re=mk(bands.real), im=mk(bands.imag))

    # ---- host-side layout helpers (global, before sharding) ----------------
    def pad_vec(self, x: jax.Array) -> jax.Array:
        return (
            self.re.pad_vec(jnp.real(x))
            + 1j * self.re.pad_vec(jnp.imag(x))
        ).astype(jnp.result_type(x.dtype, jnp.complex64))

    def unpad_vec(self, x2: jax.Array) -> jax.Array:
        return self.re.unpad_vec(x2)

    # ---- distributed matvec (inside shard_map) -----------------------------
    def _exchange_planes(self, body: jax.Array):
        """Halo-extended (hr + r_local + hr, lanes) re/im windows; the four
        ppermutes are mutually independent and independent of the band
        loads, so they overlap the kernel's first block DMAs."""
        xr = jnp.real(body)
        xi = jnp.imag(body)
        return self.re._exchange_halo(xr), self.re._exchange_halo(xi)

    def matvec(self, body: jax.Array) -> jax.Array:
        p = self.re
        xr_ext, xi_ext = self._exchange_planes(body)
        yr, yi = _dia_complex_pallas_call(
            p.bands3, self.im.bands3, xr_ext, xi_ext,
            p.offsets, p.hr, p.lanes, p.block_rows,
        )
        return (yr + 1j * yi).astype(body.dtype)

    def matvec_dot(self, body: jax.Array):
        """Fused two-plane SpMV + LOCAL partial of conj(x)·(A·x); solvers
        psum the partial over the row axis."""
        p = self.re
        xr_ext, xi_ext = self._exchange_planes(body)
        yr, yi, dre, dim = _dia_complex_dotmv_pallas_call(
            p.bands3, self.im.bands3, xr_ext, xi_ext,
            p.offsets, p.hr, p.lanes, p.block_rows,
        )
        return (yr + 1j * yi).astype(body.dtype), (dre + 1j * dim).astype(
            body.dtype
        )

    def matvec_wdot(self, body: jax.Array, w_body: jax.Array):
        """Fused two-plane SpMV + LOCAL partials of conj(w)·(A·x) and
        ‖A·x‖² — the distributed mirror of ``ComplexPaddedDIA.matvec_wdot``
        (BiCGStab's reduction barriers ride the SpMV pass). w needs no halo
        exchange (the dots read body rows only); both w streams are dropped
        when w is the input. Solvers psum the partials via ``mv_wdot``."""
        from ..ops.pallas_spmv import _dia_complex_wdot_pallas_call

        p = self.re
        xr_ext, xi_ext = self._exchange_planes(body)
        w_is_x = w_body is body
        extra = ()
        if not w_is_x:
            extra = (
                self.re._zero_halo_ext(jnp.real(w_body)),
                self.re._zero_halo_ext(jnp.imag(w_body)),
            )
        yr, yi, wdr, wdi, yd = _dia_complex_wdot_pallas_call(
            p.bands3, self.im.bands3, xr_ext, xi_ext,
            p.offsets, p.hr, p.lanes, p.block_rows, *extra,
            has_dinv=False, w_is_x=w_is_x,
        )
        y = (yr + 1j * yi).astype(body.dtype)
        return y, (wdr + 1j * wdi).astype(body.dtype), yd.astype(body.dtype)

    def matvec_conj_dot(self, body: jax.Array):
        """Fused (A·conj(x), conj(x)·A·conj(x)) local partial — the Saunders
        step of distributed CS-MINRES in one kernel pass per shard."""
        p = self.re
        xr_ext, xi_ext = self._exchange_planes(body)
        yr, yi, dre, dim = _dia_complex_dotmv_pallas_call(
            p.bands3, self.im.bands3, xr_ext, xi_ext,
            p.offsets, p.hr, p.lanes, p.block_rows, conj_x=True,
        )
        return (yr + 1j * yi).astype(body.dtype), (dre + 1j * dim).astype(
            body.dtype
        )

    def diagonal_planes_global(self):
        """Global (D·r_local, LANES) re/im diagonal planes (host-side, for
        preconditioner setup)."""
        return self.re.diagonal_global(), self.im.diagonal_global()

    def jacobi_precond(self):
        """Complex Jacobi in the distributed layout, as re/im planes
        (pad rows have zero diagonal → forced to 1 + 0i, inert)."""
        from ..precond import ComplexDiagPrecond

        dr, di = self.diagonal_planes_global()
        denom = dr * dr + di * di
        one = jnp.ones((), dr.dtype)
        safe = jnp.where(denom == 0, one, denom)
        inv_re = jnp.where(denom == 0, one, dr) / safe
        inv_im = jnp.where(denom == 0, jnp.zeros((), dr.dtype), -di) / safe
        return ComplexDiagPrecond(inv_re=inv_re, inv_im=inv_im)

    def abs_jacobi_precond(self):
        """Real 1/|d| Jacobi in the distributed layout — the valid M for the
        preconditioned Saunders process (solvers/cs_minres.py)."""
        from ..precond import DiagPrecond

        dr, di = self.diagonal_planes_global()
        d = jnp.sqrt(dr * dr + di * di)
        safe = jnp.where(d == 0, jnp.ones((), d.dtype), d)
        return DiagPrecond(diag_inv=jnp.ones((), d.dtype) / safe)


jax.tree_util.register_dataclass(
    DistComplexPaddedDIA, data_fields=("re", "im"), meta_fields=()
)
