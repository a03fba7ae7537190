"""Rational-filter (FEAST-style) interior eigensolver.

Beyond the reference (no eigensolver surface) and beyond
:func:`~sprsolve_tpu.solvers.eigs.shift_invert_eigs`: interior eigenpairs of
a deep-spectrum Hermitian operator are the one place round-4's shift-invert
was honest-but-slow (58 s at 262k rows — BENCH_NOTES "Eigen"), because
MINRES on the *indefinite* real shift A − σI is condition-bound by the gap
to the nearest eigenvalue, and no SPD preconditioner available to MINRES
helps (the Poisson diagonal is constant; multigrid needs definiteness).

The fix is the production method used by Intel FEAST / contour-integral
eigensolvers (Polizzi 2009): approximate the spectral projector onto the
eigenspace inside a disc around σ by a quadrature of the resolvent,

    ρ(A)·Y = (1/2πi) ∮_C (zI − A)⁻¹ Y dz  ≈  Σⱼ wⱼ·Re[(zⱼI − A)⁻¹ Y],

then run subspace iteration + Rayleigh–Ritz on the filtered block.  The
decisive numerical point: every quadrature node zⱼ sits OFF the real axis,
so each inner system is uniformly well conditioned — κ(zⱼI − A) ≈
‖A‖ / |Im zⱼ| — *independent of how close real eigenvalues crowd σ*.  The
inner solves trade one hard indefinite real system for a handful of easy
complex-symmetric ones.

TPU-native composition (no new kernels needed):

- zI − A for real-symmetric A is complex *symmetric* → the inner solver is
  this package's :func:`~sprsolve_tpu.solvers.cocg.cocg` (one SpMV/iter).
- The complex matvec decomposes onto the REAL fast path: (zI − A)x costs
  two real SpMVs (re/im planes) on the Pallas/XLA DIA kernels — no complex
  kernel variant required.
- The m0 right-hand sides run as one ``vmap``-batched COCG (lockstep
  ``lax.while_loop``), so the matrix stream is amortized across the block —
  SpMM economics, the same reason LOBPCG beats vector-at-a-time Lanczos
  on this hardware.
- Quadrature nodes are passed as ARRAYS (σ, r change without recompiling);
  only n_quad/m0 shape the compiled program.

Accuracy contract matches ``shift_invert_eigs``: CONVERGED is gated on the
directly measured residuals ‖A·x − λx‖/|λ| of the returned pairs on the
original A.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import IncompatibleMatrixFormat
from .cocg import cocg
from .eigs import _select_nearest

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class _ComplexShifted:
    """(zr + i·zi)I − A on complex vectors, via two REAL A-applies.

    A is a real(-dtype) flat-vector operator; the complex-symmetric
    structure COCG needs follows from Aᵀ = A.
    """

    A: object
    zr: jax.Array
    zi: jax.Array

    @property
    def shape(self):
        return self.A.shape

    def matvec(self, x: jax.Array) -> jax.Array:
        xr, xi = jnp.real(x), jnp.imag(x)
        Axr = self.A.matvec(xr)
        Axi = self.A.matvec(xi)
        return (self.zr * xr - self.zi * xi - Axr) + 1j * (
            self.zr * xi + self.zi * xr - Axi
        )

    def matvec_dot(self, x: jax.Array):
        from ..vecalg import conj_dot

        y = self.matvec(x)
        return y, conj_dot(x, y)


jax.tree_util.register_dataclass(
    _ComplexShifted, data_fields=("A", "zr", "zi"), meta_fields=()
)


def _gauss_semicircle(n_quad: int):
    """Gauss–Legendre nodes/weights for the upper semicircle contour.

    Returns (theta_j, w_j) with the filter applied as
    ρ(A)Y ≈ Σⱼ wⱼ·Re[e^{iθⱼ}·(z(θⱼ)I − A)⁻¹ Y]·r,  z(θ) = σ + r·e^{iθ}:
    ρ(λ) = (r/2π)∫₀^{2π} e^{iθ}/(z(θ)−λ) dθ and conjugate symmetry of the
    real-λ integrand folds the lower half onto the upper (factor 2).
    """
    t, v = np.polynomial.legendre.leggauss(n_quad)
    theta = np.pi * (t + 1.0) / 2.0          # (0, π)
    w = v * np.pi / 2.0 * (1.0 / np.pi)      # (r/2π)·2·dθ/dt, r applied later
    return theta, w


def rational_filter_eigs(
    A,
    k: int,
    sigma: float,
    *,
    radius: Optional[float] = None,
    side: str = "both",
    m0: Optional[int] = None,
    n_quad: int = 6,
    inner_tol: Optional[float] = None,
    inner_max_iter: int = 600,
    tol: float = 1e-6,
    max_iter: int = 8,
    optimize_layout: bool = True,
    seed: int = 0,
):
    """The ``k`` eigenpairs of real-symmetric ``A`` nearest ``sigma``.

    Same return contract as :func:`shift_invert_eigs`: ``(lam, X, info)``
    with eigenvalues ordered by |λ − σ|, ``info.residual`` the worst
    measured A-residual of the returned pairs, ``info.iterations`` the
    TOTAL inner COCG iterations across all quadrature solves (the honest
    cost unit — each is one complex SpMV = two real SpMVs).

    ``radius``: half-width of the search disc around σ.  ``None``
    auto-calibrates: start from a small fraction of the Gershgorin width
    and expand/shrink between subspace iterations until the disc holds
    roughly ``k``–``m0`` Ritz values.  ``m0`` (subspace size, default
    ``max(2k, k+4)``) must exceed the number of eigenvalues in the final
    disc for the classical FEAST convergence argument to apply.
    ``max_iter`` caps *subspace* iterations (FEAST typically needs 2-4
    once the radius is right).
    """
    if k < 1:
        raise IncompatibleMatrixFormat(f"need k >= 1, got {k}")
    if side not in ("both", "above", "below"):
        raise IncompatibleMatrixFormat(
            f"side must be 'both', 'above' or 'below', got {side!r}"
        )
    if m0 is None:
        m0 = max(2 * k, k + 6)
    if m0 < k:
        raise IncompatibleMatrixFormat(f"need m0 >= k, got m0={m0} < k={k}")
    if inner_tol is None:
        inner_tol = min(tol * 1e-2, 1e-7)

    from ..sparse.containers import CSC, CSR
    from ..utils.bounds import gershgorin_bounds

    op = A
    bounds = None
    if isinstance(op, CSC):
        op = op.to_csr()
    if isinstance(op, CSR):
        bounds = gershgorin_bounds(op)
        if optimize_layout:
            from ..ops.optimize import optimize as _optimize

            op = _optimize(op)
    if hasattr(op, "pad_vec"):
        from ..multigrid import FlatViewOperator

        op = FlatViewOperator(op=op)
    n = op.shape[0]

    dt = getattr(op, "dtype", None)
    if dt is None and hasattr(op, "op"):
        dt = getattr(op.op, "dtype", None)
    if dt is None:
        dt = jnp.float64
    rdt = jnp.dtype(dt)
    if rdt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise IncompatibleMatrixFormat(
            "rational_filter_eigs needs a real symmetric operator "
            f"(dtype {rdt}); for Hermitian complex use shift_invert_eigs"
        )

    theta_np, w_np = _gauss_semicircle(int(n_quad))
    theta = jnp.asarray(theta_np, rdt)
    wq = jnp.asarray(w_np, rdt)

    rng = np.random.default_rng(seed)
    Y0 = jnp.asarray(rng.standard_normal((n, m0)), rdt)

    def _one_node(Yc, zr, zi):
        opz = _ComplexShifted(A=op, zr=zr, zi=zi)
        solve_col = lambda y: cocg(
            opz, y, tol=inner_tol, max_iter=inner_max_iter
        )
        X, infos = jax.vmap(solve_col, in_axes=1, out_axes=(1, 0))(Yc)
        return X, jnp.sum(infos.iterations)

    @partial(jax.jit, static_argnames=())
    def filter_and_ritz(Y, r):
        """One subspace iteration: Q = ρ(A)Y, Rayleigh–Ritz on Q."""
        cdt = jnp.complex64 if rdt == jnp.dtype(jnp.float32) else jnp.complex128
        Yc = Y.astype(cdt)
        Q = jnp.zeros_like(Y)
        its = jnp.int32(0)
        for j in range(int(n_quad)):       # static unroll, n_quad small
            zr = sigma + r * jnp.cos(theta[j])
            zi = r * jnp.sin(theta[j])
            Xj, itj = _one_node(Yc, zr, zi)
            phase = jnp.exp(1j * theta[j].astype(cdt))
            Q = Q + (r * wq[j]) * jnp.real(phase * Xj)
            its = its + itj.astype(jnp.int32)
        # orthonormalize the filtered block (random noise fills directions
        # the filter killed — harmless, RR sorts them outside the disc)
        Qo, _ = jnp.linalg.qr(Q)
        AQ = (
            op.matmat(Qo)
            if hasattr(op, "matmat")
            else jax.vmap(op.matvec, in_axes=1, out_axes=1)(Qo)
        )
        H = jnp.matmul(Qo.T, AQ, precision=_HI)
        H = 0.5 * (H + H.T)
        lam, W = jnp.linalg.eigh(H)
        V = jnp.matmul(Qo, W, precision=_HI)
        AV = jnp.matmul(AQ, W, precision=_HI)
        R = AV - V * lam[None, :]
        rel = jnp.linalg.norm(R, axis=0) / jnp.maximum(
            jnp.abs(lam), jnp.finfo(rdt).tiny
        )
        # stochastic eigencount: E[yᵀρ(A)y] = tr ρ(A) ≈ #eigs inside the
        # disc when Y is the standard-normal block (ONLY then — the host
        # loop tracks that).  One dot per column, drives the one-shot
        # radius calibration below.
        est = jnp.sum(Y * Q) / Y.shape[1]
        return V, lam, rel, its, est

    # initial radius: user-given, else a small slice of the spectrum width
    if radius is not None:
        r_cur = float(radius)
        calibrate = False
    else:
        if bounds is None:
            raise IncompatibleMatrixFormat(
                "radius=None auto-calibration needs a CSR/CSC input "
                "(Gershgorin seed); pass radius= for a bare operator"
            )
        r_cur = max((bounds[1] - bounds[0]) * 1e-3, 1e-12)
        calibrate = True

    total_inner = 0
    best = None
    Y = Y0
    y_is_random = True
    # aim the disc at slightly more than k eigenvalues, leaving ≥ 2/3 of
    # the (m0 − k) columns as the convergence buffer the classical FEAST
    # rate ρ(λ_{m0+1})/ρ(λ_k) depends on (an overfull disc starves it)
    target = k + max(1.0, (m0 - k) / 3.0)
    calib_left = 6
    for _ in range(int(max_iter)):
        V, lam, rel, its, est = filter_and_ritz(Y, jnp.asarray(r_cur, rdt))
        total_inner += int(its)
        lam_np = np.asarray(lam)
        rel_np = np.asarray(rel)
        inside = np.abs(lam_np - sigma) <= r_cur
        if side == "above":
            inside &= lam_np >= sigma
        elif side == "below":
            inside &= lam_np < sigma
        n_in = int(inside.sum())
        best = (lam_np, rel_np, np.asarray(V))
        # done when the k nearest NON-GHOST pairs inside the disc meet
        # tol.  A ghost — a spurious boundary Ritz value, the classical
        # FEAST artifact, with a residual orders above tol that never
        # improves — is excluded from the candidate set so it cannot
        # block termination; a merely slow real pair (within the ghost
        # threshold but above tol) still does, and the loop keeps
        # iterating until it converges.
        ghost_thr = max(10.0 * tol, float(np.sqrt(np.finfo(rdt).eps)))
        cand = np.where(inside & (rel_np <= ghost_thr))[0]
        cand = cand[np.argsort(np.abs(lam_np[cand] - sigma))][:k]
        if (
            len(cand) >= 1
            and (len(cand) >= k or not calibrate)
            and bool(np.all(rel_np[cand] <= tol))
        ):
            break
        if calibrate and calib_left > 0 and (n_in < k or n_in > m0 - 2):
            calib_left -= 1
            # one-shot proportional correction, assuming locally-linear
            # eigenvalue density: count(r) ∝ r.  The Ritz count saturates
            # at m0, so when Y was the random block prefer the unbiased
            # stochastic trace estimate (can be ≫ m0 for an oversized
            # disc, landing the correction in one step instead of a
            # geometric walk — each walk step costs a full set of inner
            # solves).
            count = float(n_in)
            if y_is_random:
                count = max(count, float(est))
            count = max(count, 0.5)
            r_cur *= float(np.clip(target / count, 0.05, 20.0))
            Y = Y0          # restart from the random block: keeps the
            y_is_random = True  # trace estimator valid next pass
            continue
        Y = V  # plain subspace iteration on the Ritz block
        y_is_random = False

    lam_np, rel_np, Vnp = best
    # disc filter + GHOST filter: a Ritz value whose measured A-residual
    # sits orders above tol is a spurious boundary artifact (the filter's
    # soft edge), not an eigenpair — returning it as a "nearest" pair
    # would be garbage-with-a-label.  Dropping it either leaves k real
    # pairs (CONVERGED) or fewer (honest INSUFFICIENT_ITER).
    order_keep = (np.abs(lam_np - sigma) <= r_cur) & (
        rel_np <= max(10.0 * tol, np.sqrt(np.finfo(rdt).eps))
    )
    # pack exactly like shift_invert_eigs (side filter, |λ−σ| order,
    # dedupe, measured-residual CONVERGED gate)
    return _select_nearest(
        lam_np[order_keep], rel_np[order_keep], Vnp[:, order_keep],
        sigma, side, k, tol, total_inner,
    )
