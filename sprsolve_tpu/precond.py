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


def _split_factored(n, indptr, indices, factored):
    """Host-side split of a merged factor values array into CSR triplets:
    (strict-lower, strict-upper, diagonal).  The diagonal positions hold
    diag(U) after ilu0 and diag(L) after ic0; ic0 leaves the strict-upper
    positions untouched, so its caller ignores the ``up`` triplet."""
    import numpy as np

    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    lo = cols < rows
    up = cols > rows
    dg = cols == rows
    diag = np.zeros(n, dtype=factored.dtype)
    diag[rows[dg]] = factored[dg]

    def csr_of(mask):
        ip = np.zeros(n + 1, dtype=np.int64)
        np.add.at(ip, rows[mask] + 1, 1)
        np.cumsum(ip, out=ip)
        return ip, indices[mask].astype(np.int32), factored[mask]

    return csr_of(lo), csr_of(up), diag


def _operator_of(n, trip, dtype, layout_kwargs):
    """Build a device operator for one triangular part, or None if empty."""
    import numpy as np

    from .ops.optimize import optimize
    from .sparse.containers import CSR

    ip, ind, val = trip
    if len(val) == 0:
        return None
    csr = CSR.from_arrays(
        jnp.asarray(val.astype(dtype, copy=False)),
        jnp.asarray(ind),
        jnp.asarray(ip),
        (n, n),
    )
    return optimize(csr, **layout_kwargs)


def _sweep_lower(L_s, r, y0, sweeps):
    """Truncated-Neumann solve of (I + L_s)·y = r: y ← r − L_s·y."""
    y = y0
    if L_s is None:
        return r
    for _ in range(sweeps):
        y = r - L_s.matvec(y)
    return y


def _sweep_scaled(N_s, d_inv, r, z0, sweeps):
    """Truncated-Jacobi solve of (D + N_s)·z = r: z ← D⁻¹(r − N_s·z)."""
    z = z0
    if N_s is None:
        return r * d_inv
    for _ in range(sweeps):
        z = (r - N_s.matvec(z)) * d_inv
    return z


@dataclasses.dataclass(frozen=True)
class ILU0Precond:
    """ILU(0) preconditioner with iterative (Jacobi-sweep) triangular solves.

    The factorization A ≈ L·U (zero fill-in, ``native.ilu0`` — the analog of
    what MKL-era CPU codes pair with the reference's solvers; the reference
    itself ships only ``DiagPrecond``, ``src/precond.rs``) runs once on the
    host.  The *apply* replaces the inherently sequential triangular solves
    with ``sweeps`` truncated-Neumann iterations — each sweep is one SpMV
    with a strict-triangular factor, so the apply is stencil-kernel-shaped
    and distributes/jits like any operator (the standard accelerator
    formulation, cf. Chow & Patel, "Fine-grained parallel ILU").  With
    ``sweeps ≥ the factor's level depth`` the solve is exact; small sweep
    counts give a weaker but still effective preconditioner.

    Not symmetric — use with BiCGStab (the reference pairs its
    preconditioner with BiCGStab the same way, ``src/bicg_stab.rs:204``).
    For MINRES use :class:`IC0Precond`, whose apply is SPD by construction.
    """

    L_s: object        # strict lower of L (unit diag implied), or None
    U_s: object        # strict upper of U, or None
    du_inv: jax.Array  # 1 / diag(U)
    sweeps: int = 3

    @property
    def shape(self):
        n = self.du_inv.shape[0]
        return (n, n)

    @staticmethod
    def from_csr(A, *, sweeps: int = 3, **layout_kwargs):
        """Factor a host-side CSR and build the apply operators.

        ``layout_kwargs`` are forwarded to :func:`~sprsolve_tpu.ops.optimize`
        for the triangular parts (default: XLA DIA/BSR layouts;
        ``prefer_pallas`` is off because the factors run inside the
        preconditioner apply where the padded-layout protocol of the Pallas
        operators does not compose).
        """
        import numpy as np

        from .errors import ZeroDiagonalElem
        from . import native

        n = A.shape[0]
        indptr = np.asarray(A.indptr, np.int64)
        indices = np.asarray(A.indices, np.int32)
        values = np.asarray(A.data)
        try:
            factored = native.ilu0(n, indptr, indices, values)
        except ZeroDivisionError as e:
            raise ZeroDiagonalElem(
                f"ILU(0): zero pivot at row {e.args[0]}"
            ) from None
        lo, up, diag = _split_factored(n, indptr, indices, factored)
        layout_kwargs.setdefault("prefer_pallas", False)
        dtype = values.dtype
        return ILU0Precond(
            L_s=_operator_of(n, lo, dtype, layout_kwargs),
            U_s=_operator_of(n, up, dtype, layout_kwargs),
            du_inv=jnp.asarray(np.ones((), dtype) / diag),
            sweeps=sweeps,
        )

    def matvec(self, r: jax.Array) -> jax.Array:
        # L·y = r (unit lower) then U·z = y (upper with diagonal du)
        y = _sweep_lower(self.L_s, r, r, self.sweeps)
        return _sweep_scaled(self.U_s, self.du_inv, y, y * self.du_inv, self.sweeps)

    def matvec_dot(self, x: jax.Array):
        from .vecalg import conj_dot

        y = self.matvec(x)
        return y, conj_dot(x, y)


jax.tree_util.register_dataclass(
    ILU0Precond, data_fields=("L_s", "U_s", "du_inv"), meta_fields=("sweeps",)
)


@dataclasses.dataclass(frozen=True)
class IC0Precond:
    """IC(0) (incomplete Cholesky) preconditioner, SPD apply, for MINRES.

    A ≈ L·Lᴴ factored on the host (``native.ic0``); the apply approximates
    z = L⁻ᴴ L⁻¹ r with ``sweeps`` truncated-Jacobi iterations per
    triangular solve.  Writing the approximate L-solve as the polynomial
    operator S = Σ_{j≤sweeps} (−D⁻¹L_s)ʲ D⁻¹, the approximate Lᴴ-solve with
    the same sweep count is exactly Sᴴ, so the composed apply M̃⁻¹ = Sᴴ·S is
    Hermitian positive definite for any sweep count — it passes MINRES's
    β² = rᴴM⁻¹r > 0 gate (``src/minres.rs:235-244``) by construction.
    """

    L_s: object         # strict lower of L, or None
    LH_s: object        # its conjugate transpose (strict upper), or None
    dl_inv: jax.Array   # 1 / diag(L)  (real positive)
    sweeps: int = 3

    @property
    def shape(self):
        n = self.dl_inv.shape[0]
        return (n, n)

    @staticmethod
    def from_csr(A, *, sweeps: int = 3, **layout_kwargs):
        import numpy as np

        from .errors import InvalidPreconditioner
        from . import native

        n = A.shape[0]
        indptr = np.asarray(A.indptr, np.int64)
        indices = np.asarray(A.indices, np.int32)
        values = np.asarray(A.data)
        try:
            factored = native.ic0(n, indptr, indices, values)
        except ZeroDivisionError as e:
            raise InvalidPreconditioner(
                f"IC(0): non-positive pivot at row {e.args[0]} "
                "(matrix not SPD on this pattern)"
            ) from None
        lo, _, diag = _split_factored(n, indptr, indices, factored)
        # build Lᴴ strict part host-side: transpose of the strict-lower CSR
        ip, ind, val = lo
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ip))
        tr_rows, tr_cols, tr_vals = ind.astype(np.int64), rows, np.conj(val)
        tro = np.lexsort((tr_cols, tr_rows))
        tip = np.zeros(n + 1, dtype=np.int64)
        np.add.at(tip, tr_rows[tro] + 1, 1)
        np.cumsum(tip, out=tip)
        up = (tip, tr_cols[tro].astype(np.int32), tr_vals[tro])
        layout_kwargs.setdefault("prefer_pallas", False)
        dtype = values.dtype
        rdt = np.real(diag).dtype
        return IC0Precond(
            L_s=_operator_of(n, lo, dtype, layout_kwargs),
            LH_s=_operator_of(n, up, dtype, layout_kwargs),
            dl_inv=jnp.asarray(np.ones((), rdt) / np.real(diag).astype(rdt)),
            sweeps=sweeps,
        )

    def matvec(self, r: jax.Array) -> jax.Array:
        y = _sweep_scaled(self.L_s, self.dl_inv, r, r * self.dl_inv, self.sweeps)
        return _sweep_scaled(self.LH_s, self.dl_inv, y, y * self.dl_inv, self.sweeps)

    def matvec_dot(self, x: jax.Array):
        from .vecalg import conj_dot

        y = self.matvec(x)
        return y, conj_dot(x, y)


jax.tree_util.register_dataclass(
    IC0Precond, data_fields=("L_s", "LH_s", "dl_inv"), meta_fields=("sweeps",)
)


@dataclasses.dataclass(frozen=True)
class RelayedPrecond:
    """Adapts a flat-layout preconditioner to a padded-layout operator.

    Operators exposing ``pad_vec``/``unpad_vec`` (PaddedDIA & co.) run their
    solves in an internal 2-D layout; a preconditioner built in the natural
    (n,) layout is applied by round-tripping through that layout.  pad/unpad
    are cheap jnp reshapes relative to the apply itself.  ``DiagPrecond`` has
    a faster dedicated path (``relay_diag_precond``, a one-time diagonal
    re-lay); this wrapper serves every other preconditioner type.
    """

    inner: object
    op: object

    @property
    def shape(self):
        return self.inner.shape

    def matvec(self, r2: jax.Array) -> jax.Array:
        return self.op.pad_vec(self.inner.matvec(self.op.unpad_vec(r2)))

    def matvec_dot(self, r2: jax.Array):
        from .vecalg import conj_dot

        y = self.matvec(r2)
        return y, conj_dot(r2, y)


jax.tree_util.register_dataclass(
    RelayedPrecond, data_fields=("inner", "op"), meta_fields=()
)
