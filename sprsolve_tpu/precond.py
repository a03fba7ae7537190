"""Preconditioners.

``DiagPrecond`` mirrors the reference (``src/precond.rs``): the reciprocal of
the diagonal is taken once at construction (``src/precond.rs:20-30``) and the
apply is an elementwise multiply (``src/precond.rs:48-52``).  As in the
reference, the diagonal may be *real* while the system is complex
(``src/precond.rs:6-13``, exercised by ``tests/test_complex_solve.rs:44``) —
jnp broadcasting provides the mixed-dtype multiply.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiagPrecond:
    """Jacobi (diagonal) preconditioner: M⁻¹ = diag(1/d)."""

    diag_inv: jax.Array

    @staticmethod
    def new(diag) -> "DiagPrecond":
        diag = jnp.asarray(diag)
        return DiagPrecond(diag_inv=jnp.ones((), diag.dtype) / diag)

    @property
    def shape(self):
        n = self.diag_inv.shape[0]
        return (n, n)

    def matvec(self, x: jax.Array) -> jax.Array:
        return x * self.diag_inv

    def matvec_dot(self, x: jax.Array):
        # The reference leaves this unimplemented! (src/precond.rs:55-62);
        # here the fused form is free, so provide it.
        from .vecalg import conj_dot

        y = x * self.diag_inv
        return y, conj_dot(x, y)


jax.tree_util.register_dataclass(DiagPrecond, data_fields=("diag_inv",), meta_fields=())
