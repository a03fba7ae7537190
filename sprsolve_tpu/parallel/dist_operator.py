"""Row-partitioned distributed operators (the SP-like axis of this library).

Each device in a 1-D mesh owns a contiguous block of matrix rows and the
matching block of every solver vector (SURVEY.md §5: "row-partition the matrix
across chips, each chip holding a block of rows + the halo entries of x its
columns touch").  Two execution strategies:

- :class:`AllGatherELL` — general sparsity: the x vector is all-gathered over
  the mesh axis, local rows then do a plain ELL SpMV against the full vector.
  Bandwidth cost O(n) per step but works for any pattern; XLA lowers the
  all-gather onto ICI.
- :class:`HaloDIA` — banded/stencil matrices: only boundary slices of width
  h = max|offset| move, via neighbor ``ppermute``.  The halo exchange is
  expressed as separate data flow from the interior band products so XLA can
  overlap the permute with local compute — structurally the ring-attention
  overlap trick applied to SpMV.

Both are pytrees; ``pspec(axis)`` returns the matching tree of PartitionSpecs
for ``shard_map`` in_specs.  Row blocks are padded with identity rows (and
zero rhs entries) to make n divisible by the mesh size — zeros propagate
through every Krylov recurrence, so padding is exact, not approximate.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..sparse.containers import CSR, DIA, ELL


def auto_mesh(mesh, axis_name: str):
    """A 1-D mesh with AUTO axis types for the manual ``shard_map`` drivers.

    ``jax.make_mesh`` defaults to EXPLICIT axis types, under which a
    replicated closure constant batched inside a manual shard_map body trips
    an XLA sharding-override assertion (seen with ``vmap``-of-``minres``
    inside :func:`~sprsolve_tpu.parallel.distributed_shift_invert_eigs`).
    The drivers here use shard_map in fully-manual mode, so Auto axes are
    the correct typing; a user-supplied Explicit mesh is rebuilt with the
    same devices.
    """
    from jax.sharding import AxisType, Mesh

    if mesh is None:
        devices = jax.devices()
        return jax.make_mesh(
            (len(devices),), (axis_name,), devices=devices,
            axis_types=(AxisType.Auto,),
        )
    if all(t == AxisType.Auto for t in mesh.axis_types):
        return mesh
    return Mesh(
        mesh.devices, mesh.axis_names,
        axis_types=(AxisType.Auto,) * len(mesh.axis_names),
    )


@dataclasses.dataclass(frozen=True)
class AllGatherELL:
    """Local row-block ELL over an all-gathered x. General sparsity."""

    data: jax.Array   # (n_pad, k) globally / (rows_per_device, k) inside shard_map
    cols: jax.Array   # same shape, *global* column ids
    shape: Tuple[int, int]
    axis_name: str

    @property
    def dtype(self):
        return self.data.dtype

    def pspec(self, axis_name=None) -> "AllGatherELL":
        a = axis_name or self.axis_name
        return AllGatherELL(
            data=P(a, None), cols=P(a, None), shape=self.shape, axis_name=self.axis_name
        )

    def matvec(self, x_local: jax.Array) -> jax.Array:
        x_full = lax.all_gather(x_local, self.axis_name, axis=0, tiled=True)
        return jnp.sum(self.data * jnp.take(x_full, self.cols, axis=0), axis=1)

    def matvec_dot(self, x_local: jax.Array):
        # returns the LOCAL partial dot; solvers psum it over the axis.
        from ..vecalg import conj_dot

        y = self.matvec(x_local)
        return y, conj_dot(x_local, y)

    def matmat(self, X_local: jax.Array) -> jax.Array:
        """Block SpMM A·X for an (m, k) local block — ONE all-gather covers
        all k columns (the distributed-LOBPCG workhorse; a per-column
        ``matvec`` loop would pay k gathers of the same x traffic)."""
        X_full = lax.all_gather(X_local, self.axis_name, axis=0, tiled=True)
        # (rows, kk, k) gathered operand against (rows, kk) values — an MXU
        # contraction over the ELL slot axis
        return jnp.einsum(
            "re,rek->rk", self.data, jnp.take(X_full, self.cols, axis=0)
        )


jax.tree_util.register_dataclass(
    AllGatherELL, data_fields=("data", "cols"), meta_fields=("shape", "axis_name")
)


@dataclasses.dataclass(frozen=True)
class HaloDIA:
    """Local row-block DIA with neighbor halo exchange. Banded matrices only.

    Requires max|offset| ≤ rows_per_device. Band values are stored at row
    index (global layout sliced by rows), so a device's band block already
    matches its row block.
    """

    bands: jax.Array          # (n_diags, n_pad) globally / (n_diags, m) locally
    offsets: Tuple[int, ...]  # static
    shape: Tuple[int, int]
    axis_name: str

    @property
    def dtype(self):
        return self.bands.dtype

    @property
    def halo(self) -> int:
        return max((abs(o) for o in self.offsets), default=0)

    def pspec(self, axis_name=None) -> "HaloDIA":
        a = axis_name or self.axis_name
        return HaloDIA(
            bands=P(None, a),
            offsets=self.offsets,
            shape=self.shape,
            axis_name=self.axis_name,
        )

    def matvec(self, x_local: jax.Array) -> jax.Array:
        ax = self.axis_name
        m = x_local.shape[0]
        h = self.halo
        nd = lax.axis_size(ax)

        # Neighbor halo exchange: device i receives the first h entries of
        # device i+1 (right halo) and the last h of device i-1 (left halo).
        # ppermute leaves unmatched destinations zero — exactly the boundary
        # condition (out-of-range x reads as 0, matching the zero band values
        # DIA construction guarantees there).
        right_halo = lax.ppermute(
            x_local[:h], ax, perm=[(i, (i - 1) % nd) for i in range(1, nd)]
        )
        left_halo = lax.ppermute(
            x_local[m - h :], ax, perm=[(i, (i + 1) % nd) for i in range(nd - 1)]
        )

        # Interior contributions first (pure local data flow) so XLA can
        # overlap the two ppermutes with this compute.
        y = jnp.zeros(m, dtype=jnp.result_type(self.dtype, x_local.dtype))
        zero = jnp.zeros((), x_local.dtype)
        for d, off in enumerate(self.offsets):
            if off == 0:
                y = y + self.bands[d] * x_local
            elif off > 0:
                local = jnp.concatenate([x_local[off:], jnp.zeros(off, x_local.dtype)])
                y = y + self.bands[d] * local
            else:
                local = jnp.concatenate([jnp.zeros(-off, x_local.dtype), x_local[:off]])
                y = y + self.bands[d] * local

        # Halo corrections: rows within h of the block boundary pick up the
        # neighbor entries the interior pass zero-filled.
        for d, off in enumerate(self.offsets):
            if off > 0:
                # rows m-off..m read x_global[i+off] from the right neighbor
                corr = self.bands[d, m - off :] * right_halo[:off]
                y = y.at[m - off :].add(corr)
            elif off < 0:
                corr = self.bands[d, : -off] * left_halo[h + off :]
                y = y.at[: -off].add(corr)
        return y

    def matvec_dot(self, x_local: jax.Array):
        from ..vecalg import conj_dot

        y = self.matvec(x_local)
        return y, conj_dot(x_local, y)

    def matmat(self, X_local: jax.Array) -> jax.Array:
        """Block SpMM A·X for an (m, k) local block — ONE halo exchange
        covers all k columns (two ppermutes of (h, k) slabs, vs 2k for a
        per-column ``matvec`` loop).  Same interior-first data flow as
        ``matvec`` so XLA overlaps the permutes with the band products."""
        ax = self.axis_name
        m = X_local.shape[0]
        h = self.halo
        nd = lax.axis_size(ax)
        tail = X_local.shape[1:]

        right_halo = lax.ppermute(
            X_local[:h], ax, perm=[(i, (i - 1) % nd) for i in range(1, nd)]
        )
        left_halo = lax.ppermute(
            X_local[m - h :], ax, perm=[(i, (i + 1) % nd) for i in range(nd - 1)]
        )

        def zrows(r):
            return jnp.zeros((r,) + tail, X_local.dtype)

        Y = jnp.zeros(
            (m,) + tail, dtype=jnp.result_type(self.dtype, X_local.dtype)
        )
        for d, off in enumerate(self.offsets):
            band = self.bands[d][:, None]
            if off == 0:
                Y = Y + band * X_local
            elif off > 0:
                Y = Y + band * jnp.concatenate([X_local[off:], zrows(off)])
            else:
                Y = Y + band * jnp.concatenate([zrows(-off), X_local[:off]])
        for d, off in enumerate(self.offsets):
            if off > 0:
                corr = self.bands[d, m - off :][:, None] * right_halo[:off]
                Y = Y.at[m - off :].add(corr)
            elif off < 0:
                corr = self.bands[d, : -off][:, None] * left_halo[h + off :]
                Y = Y.at[: -off].add(corr)
        return Y


jax.tree_util.register_dataclass(
    HaloDIA, data_fields=("bands",), meta_fields=("offsets", "shape", "axis_name")
)


def _padded_rows(n: int, n_devices: int) -> int:
    return (n + n_devices - 1) // n_devices * n_devices


def partition_csr(m: CSR, n_devices: int, axis_name: str = "rows") -> AllGatherELL:
    """CSR → row-padded global ELL ready to shard over ``axis_name``.

    Pad rows are identity (a_ii = 1) so the padded system block-decouples;
    with zero rhs padding the extra coordinates stay exactly 0.
    """
    ell = ELL.from_csr(m)
    n = m.shape[0]
    n_pad = _padded_rows(n, n_devices)
    if n_pad != n:
        extra = n_pad - n
        pad_data = np.zeros((extra, ell.k), dtype=np.asarray(ell.data).dtype)
        pad_cols = np.zeros((extra, ell.k), dtype=np.int32)
        pad_data[:, 0] = 1.0
        pad_cols[:, 0] = np.arange(n, n_pad)
        data = jnp.concatenate([ell.data, jnp.asarray(pad_data)])
        cols = jnp.concatenate([ell.cols, jnp.asarray(pad_cols)])
    else:
        data, cols = ell.data, ell.cols
    return AllGatherELL(
        data=data, cols=cols, shape=(n_pad, n_pad), axis_name=axis_name
    )


def partition_dia(m: DIA, n_devices: int, axis_name: str = "rows") -> HaloDIA:
    """DIA → row-padded global banded layout ready to shard over ``axis_name``."""
    n = m.shape[0]
    n_pad = _padded_rows(n, n_devices)
    if 0 not in m.offsets:
        raise ValueError("partition_dia requires a stored main diagonal")
    bands = np.asarray(m.bands)
    if n_pad != n:
        pad = np.zeros((bands.shape[0], n_pad - n), dtype=bands.dtype)
        pad[m.offsets.index(0), :] = 1.0  # identity pad rows
        bands = np.concatenate([bands, pad], axis=1)
    h = max(abs(o) for o in m.offsets)
    if h > n_pad // n_devices:
        raise ValueError(
            f"bandwidth {h} exceeds rows-per-device {n_pad // n_devices}; "
            "use AllGatherELL or fewer devices"
        )
    return HaloDIA(
        bands=jnp.asarray(bands),
        offsets=m.offsets,
        shape=(n_pad, n_pad),
        axis_name=axis_name,
    )
