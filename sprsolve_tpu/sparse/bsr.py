"""BSR (block sparse row): the MXU-friendly layout for general sparsity.

TPU gathers are slow (~8 ns/element — see tools/probe_gather.py), so the
scalar-gather ELL path cannot approach bandwidth for unstructured matrices.
BSR trades zero-padding for regularity the other way: nonzeros are grouped
into dense (bs × bs) blocks, the SpMV becomes a batch of dense block·vector
products (batched on the MXU) plus a row-block segment-sum, and the only
gather left is a *row-granular* gather of x blocks — contiguous bs-element
moves instead of scalar picks.

Economics: per stored block, traffic is bs²·4 bytes for bs nnz-columns of
useful work; worth it when the in-block fill ratio ≳ 5-10% (always true for
FEM/blocked physics matrices, and for RCM-reordered banded ones).
``fill_ratio`` reports it; ``optimize()`` can use it to route.
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

from .containers import CSR


def _bsr_kernel(rows_ref, cols_ref, blk_ref, x_ref, o_ref):
    """One (bs × bs) block per grid step; the x block arrives via a
    scalar-prefetched dynamic index (block-granular DMA gather — the only
    gather form that runs at bandwidth on this hardware), and the output
    block stays resident in VMEM while consecutive steps share a block-row
    (blocks are sorted by row), implementing the row segment-sum in-kernel."""
    i = pl.program_id(0)
    first_of_row = jnp.logical_or(
        i == 0, rows_ref[i] != rows_ref[jnp.maximum(i - 1, 0)]
    )

    @pl.when(first_of_row)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # (1, bs) x-block · (bs, bs) block, contracting the column dim on the MXU
    # (x/y travel as (nb, 1, bs) so every block dim equals its array dim —
    # a (1, bs) block of a (nb, bs) array violates the sublane-tiling rule)
    prod = jax.lax.dot_general(
        x_ref[0], blk_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=o_ref.dtype,
    )
    o_ref[...] += prod[None]


@functools.partial(jax.jit, static_argnames=("nb", "bs"))
def _bsr_pallas_matvec(blk_row, blk_col, blocks, x2, nb, bs):
    """(nb, bs) → (nb, bs) block-sparse matvec via scalar-prefetch DMA."""
    from .. import debug  # noqa: F401  (shares the package interpret switch)
    from ..ops.pallas_spmv import _INTERPRET

    nblk = blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, rows, cols: (i, 0, 0)),
            pl.BlockSpec((1, 1, bs), lambda i, rows, cols: (cols[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bs), lambda i, rows, cols: (rows[i], 0, 0)),
    )
    y3 = pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1, bs), x2.dtype),
        interpret=_INTERPRET[0],
    )(blk_row, blk_col, blocks, x2.reshape(nb, 1, bs))
    return y3.reshape(nb, bs)


@dataclasses.dataclass(frozen=True)
class BSR:
    """Dense-block sparse matrix: blocks[k] sits at block-row/col coordinates."""

    blocks: jax.Array    # (nblk, bs, bs)
    blk_row: jax.Array   # (nblk,) int32, sorted
    blk_col: jax.Array   # (nblk,) int32
    padded_dim: int      # nb·bs (multiple of bs)
    n: int               # logical dimension

    @property
    def shape(self) -> Tuple[int, int]:
        # logical shape: the operator consumes/produces length-n vectors
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def bs(self) -> int:
        return self.blocks.shape[1]

    @property
    def nblk(self) -> int:
        return self.blocks.shape[0]

    @property
    def fill_ratio(self) -> float:
        """Stored-nonzero density within the dense blocks (host-side)."""
        b = np.asarray(self.blocks)
        return float((b != 0).sum() / b.size) if b.size else 0.0

    @staticmethod
    def estimate_blocks(m: CSR, bs: int) -> int:
        """Number of (bs × bs) blocks the pattern touches (pattern-only,
        no block materialization) — the routing cost model in optimize()."""
        nb = -(-m.shape[0] // bs)
        br = np.asarray(m.row_ids, dtype=np.int64) // bs
        bc = np.asarray(m.indices, dtype=np.int64) // bs
        return len(np.unique(br * nb + bc))

    def jacobi_precond(self):
        """Diagonal preconditioner on the flat layout (zero diag → inert 1)."""
        from ..precond import DiagPrecond

        d = self.diagonal()
        safe = jnp.where(d == 0, jnp.ones((), d.dtype), d)
        return DiagPrecond(diag_inv=jnp.ones((), d.dtype) / safe)

    @staticmethod
    def from_csr(m: CSR, bs: int = 128) -> "BSR":
        n = m.shape[0]
        nb = -(-n // bs)
        rows = np.asarray(m.row_ids, dtype=np.int64)
        cols = np.asarray(m.indices, dtype=np.int64)
        dat = np.asarray(m.data)
        br, bc = rows // bs, cols // bs
        key = br * nb + bc
        # every block-row must own ≥1 block: the Pallas path initializes an
        # output block on first visit, so an empty block-row would stay
        # uninitialized. Add an explicit zero diagonal block where needed.
        present = np.zeros(nb, bool)
        present[np.unique(br)] = True
        missing = np.flatnonzero(~present).astype(np.int64)
        key = np.concatenate([key, missing * nb + missing])
        uniq, inv = np.unique(key, return_inverse=True)
        blocks = np.zeros((len(uniq), bs, bs), dtype=dat.dtype)
        blocks[inv[: len(dat)], rows % bs, cols % bs] = dat
        # np.unique sorts keys → blk_row ascending (sorted segments for both
        # the in-kernel row accumulation and segment_sum)
        return BSR(
            blocks=jnp.asarray(blocks),
            blk_row=jnp.asarray((uniq // nb).astype(np.int32)),
            blk_col=jnp.asarray((uniq % nb).astype(np.int32)),
            padded_dim=nb * bs,
            n=n,
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        """y = A·x on a logical-length (n,) vector.

        f32 runs the scalar-prefetch Pallas kernel (block-granular DMA
        gather + in-kernel row accumulation); other dtypes use the XLA
        einsum + segment-sum form (Mosaic has no f64 lowering)."""
        from ..ops.pallas_spmv import _INTERPRET

        bs = self.bs
        nb = self.padded_dim // bs
        xp = jnp.zeros(self.padded_dim, x.dtype).at[: self.n].set(x)
        xb = xp.reshape(nb, bs)
        if (
            self.dtype == jnp.float32 and x.dtype == jnp.float32
        ) or _INTERPRET[0]:
            yb = _bsr_pallas_matvec(
                self.blk_row, self.blk_col, self.blocks, xb, nb, bs
            )
            return yb.reshape(-1)[: self.n]
        gathered = jnp.take(xb, self.blk_col, axis=0)            # (nblk, bs)
        prod = jnp.einsum(
            "bij,bj->bi",
            self.blocks,
            gathered,
            preferred_element_type=jnp.result_type(self.dtype, x.dtype),
        )
        yb = jax.ops.segment_sum(
            prod, self.blk_row, num_segments=nb, indices_are_sorted=True
        )
        return yb.reshape(-1)[: self.n]

    def matvec_dot(self, x: jax.Array):
        from ..vecalg import conj_dot

        y = self.matvec(x)
        return y, conj_dot(x, y)

    def matmat(self, X: jax.Array) -> jax.Array:
        bs = self.bs
        nb = self.padded_dim // bs
        k = X.shape[1]
        Xp = jnp.zeros((self.padded_dim, k), X.dtype).at[: self.n].set(X)
        Xb = Xp.reshape(nb, bs, k)
        gathered = jnp.take(Xb, self.blk_col, axis=0)            # (nblk, bs, k)
        prod = jnp.einsum(
            "bij,bjk->bik",
            self.blocks,
            gathered,
            preferred_element_type=jnp.result_type(self.dtype, X.dtype),
        )
        Yb = jax.ops.segment_sum(
            prod, self.blk_row, num_segments=nb, indices_are_sorted=True
        )
        return Yb.reshape(-1, k)[: self.n]

    def diagonal(self) -> jax.Array:
        bs = self.bs
        on_diag = np.asarray(self.blk_row) == np.asarray(self.blk_col)
        blocks = np.asarray(self.blocks)[on_diag]
        brows = np.asarray(self.blk_row)[on_diag]
        diag = np.zeros(self.padded_dim, dtype=blocks.dtype)
        for b, br in zip(blocks, brows):
            diag[br * bs : (br + 1) * bs] = np.diag(b)
        return jnp.asarray(diag[: self.n])


jax.tree_util.register_dataclass(
    BSR, data_fields=("blocks", "blk_row", "blk_col"), meta_fields=("padded_dim", "n")
)
