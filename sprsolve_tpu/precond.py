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


@dataclasses.dataclass(frozen=True)
class ComplexDiagPrecond:
    """Jacobi preconditioner with a *complex* diagonal, stored as re/im planes.

    The pytree leaves are real arrays, so this preconditioner can cross jit
    boundaries on backends that reject complex device buffers (the same
    constraint that motivates :class:`~sprsolve_tpu.ops.pallas_spmv.ComplexPaddedDIA`
    and ``with_real_planes``); the complex multiply exists only inside the
    compiled program.  Semantics match ``DiagPrecond`` with ``1/d`` complex
    (reference ``src/precond.rs:20-30`` with ``V = Complex``).
    """

    inv_re: jax.Array
    inv_im: jax.Array

    @staticmethod
    def new(diag) -> "ComplexDiagPrecond":
        import numpy as np

        d = np.asarray(diag)
        inv = np.ones((), d.dtype) / d
        rdt = inv.real.dtype
        return ComplexDiagPrecond(
            inv_re=jnp.asarray(inv.real.astype(rdt)),
            inv_im=jnp.asarray(inv.imag.astype(rdt)),
        )

    @property
    def shape(self):
        n = self.inv_re.shape[0]
        return (n, n)

    def matvec(self, x: jax.Array) -> jax.Array:
        return x * (self.inv_re + 1j * self.inv_im).astype(x.dtype)

    def matvec_dot(self, x: jax.Array):
        from .vecalg import conj_dot

        y = self.matvec(x)
        return y, conj_dot(x, y)


jax.tree_util.register_dataclass(
    ComplexDiagPrecond, data_fields=("inv_re", "inv_im"), meta_fields=()
)


@dataclasses.dataclass(frozen=True)
class ChebyshevPrecond:
    """Chebyshev polynomial preconditioner: M⁻¹ ≈ p_k(A) ≈ A⁻¹ on [λmin, λmax].

    The most TPU-natural preconditioner beyond Jacobi: the apply is k SpMVs
    and axpys with *no* sequential row dependencies or triangular solves —
    it runs at full kernel speed through any operator (including the Pallas
    paths) and distributes for free.  Requires SPD-ish A with a known (or
    estimated) spectrum interval; classical three-term recurrence.

    Beyond the reference's feature set (it only ships DiagPrecond) — included
    because polynomial preconditioning is the idiomatic accelerator answer to
    the triangular-solve preconditioners TPUs can't run efficiently.
    """

    A: object          # LinearOperator
    lmin: float        # spectrum lower bound (meta: static)
    lmax: float        # spectrum upper bound
    degree: int = 4

    @property
    def shape(self):
        return self.A.shape

    @staticmethod
    def estimate_lmax(A, x_example, iters: int = 20) -> float:
        """Power-iteration estimate of the largest |eigenvalue| (host-side)."""
        import numpy as np

        x = x_example
        if float(jnp.linalg.norm(x.ravel())) == 0.0:
            x = jnp.ones_like(x_example)
        lam = 1.0
        for _ in range(iters):
            y = A.matvec(x)
            lam = float(jnp.linalg.norm(y.ravel()))
            x = y / lam
        return lam

    def matvec(self, r: jax.Array) -> jax.Array:
        # Chebyshev iteration for A z = r from z0 = 0 (Saad, Iterative
        # Methods, alg. 12.1): theta = (λmax+λmin)/2, delta = (λmax−λmin)/2.
        theta = (self.lmax + self.lmin) / 2.0
        delta = (self.lmax - self.lmin) / 2.0
        dt = jnp.asarray(theta, r.dtype)
        sigma1 = theta / delta
        rho = 1.0 / sigma1
        z = r / dt
        d = z
        res = r - self.A.matvec(z)
        for _ in range(self.degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = res * jnp.asarray(2.0 * rho_new / delta, r.dtype) + d * jnp.asarray(
                rho_new * rho, r.dtype
            )
            z = z + d
            res = r - self.A.matvec(z)
            rho = rho_new
        return z

    def matvec_dot(self, r: jax.Array):
        from .vecalg import conj_dot

        z = self.matvec(r)
        return z, conj_dot(r, z)


jax.tree_util.register_dataclass(
    ChebyshevPrecond, data_fields=("A",), meta_fields=("lmin", "lmax", "degree")
)
