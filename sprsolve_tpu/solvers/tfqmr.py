"""TFQMR: transpose-free quasi-minimal-residual solver.

Beyond the reference's surface (nonsymmetric coverage there is BiCGStab,
``src/bicg_stab.rs``): TFQMR (Freund, 1993) applies the quasi-minimal
residual smoothing to the CGS half-iterates, giving the smooth, nearly
monotone convergence CGS lacks at the same cost — two SpMVs and two M⁻¹
applies per full iteration, transpose-free.  Part of the standard
``scipy.sparse.linalg`` family (``scipy tfqmr``).

Formulation: Saad, *Iterative Methods for Sparse Linear Systems*,
Alg. 7.7, with both half-steps unrolled in one loop body and the A·y
product of the trailing half-step carried into the next iteration (exactly
two fresh SpMVs per body).  Right preconditioning runs the recurrence on
Â = A·M⁻¹ in residual space; the solution is tracked directly through the
carried D = M⁻¹d (M⁻¹y is needed for the SpMV anyway, so preconditioning
adds no extra applies).

Convergence: the loop tests Freund's quasi-residual bound
‖r_m‖ ≤ τ_m·√(m+1) (m = half-steps), which never under-reports the true
residual in exact arithmetic; the returned ``SolveInfo.residual`` is the
TRUE relative residual ‖b − A·x‖/‖b‖ computed once after the loop, and
``CONVERGED`` is gated on it — the measurement-honesty convention of this
package.  Breakdown: σ = r̃ᴴv or ρ = r̃ᴴw vanishing without convergence
are predicated ``Status.BREAKDOWN`` exits against the ε²-scaled BiCGStab
thresholds (``src/bicg_stab.rs:84-85``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..errors import Status
from ..ops.operator import IdentityOperator
from ..vecalg import axpy, conj_dot, eps_for, norm2
from .common import check_shapes, make_info


class _State(NamedTuple):
    x: jax.Array
    w: jax.Array        # w_m: CGS half-iterate residual
    y: jax.Array        # y_m (odd index at loop top)
    yM: jax.Array       # M⁻¹·y_m
    Ay: jax.Array       # Â·y_m = A·(M⁻¹ y_m)
    v: jax.Array        # v_j direction
    D: jax.Array        # M⁻¹·d quasi-minimization direction
    tau: jax.Array      # real: quasi-residual scale
    theta: jax.Array    # real
    eta: jax.Array      # T scalar
    alpha: jax.Array    # T scalar (of the previous odd step, for D)
    rho: jax.Array      # T scalar: r̃ᴴw
    bound: jax.Array    # real: τ·√(m+1) quasi-residual bound
    its: jax.Array
    status: jax.Array
    hist: jax.Array


def tfqmr(
    A,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    M=None,
    tol,
    max_iter,
    axis_name: Optional[str] = None,
    record_residuals: bool = False,
):
    """Solve general A·x = b with TFQMR. Returns ``(x, SolveInfo)``.

    ``M`` applies M⁻¹ (right preconditioning; any of this package's
    preconditioners).  ``max_iter`` counts full iterations (two SpMVs
    each).  ``record_residuals=True`` (static ``max_iter``) adds the
    per-iteration quasi-residual-bound trace as a third output (the bound,
    not the true residual — computing the latter per iteration would cost
    a third SpMV).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    check_shapes(A, b, x0, axis_name)
    if M is None:
        M = IdentityOperator(b.shape[0])

    T = b.dtype
    rdt = jnp.finfo(T).dtype if not jnp.iscomplexobj(b) else jnp.real(b).dtype
    tol = jnp.asarray(tol, dtype=rdt)
    # +1: the final write lands at hist[its] with its == max_iter when
    # convergence hits exactly at the budget
    hist_len = int(max_iter) + 1 if record_residuals else 0
    max_iter = jnp.asarray(max_iter, dtype=jnp.int32)
    eps = eps_for(b.dtype)
    one_t = jnp.ones((), T)
    one_r = jnp.ones((), rdt)

    def main(rhs_norm):
        tol2 = tol * rhs_norm

        r0 = axpy(-one_t, A.matvec(x0), b)  # r = b − A·x
        r_norm0 = norm2(r0, axis_name)
        rt = r0                              # shadow residual r̃ = r₀

        def early(_):
            hist = jnp.full(hist_len, jnp.nan, dtype=rdt)
            if hist_len:
                hist = hist.at[0].set(r_norm0 / rhs_norm)
            return x0, make_info(0, r_norm0 / rhs_norm, Status.CONVERGED), hist

        def iterate(_):
            brk_tol = (r_norm0 * eps) ** 2
            tiny = jnp.asarray(jnp.finfo(rdt).tiny * 1e4, rdt)

            yM0 = M.matvec(r0)
            Ay0 = A.matvec(yM0)
            st0 = _State(
                x=x0, w=r0, y=r0, yM=yM0, Ay=Ay0, v=Ay0,
                D=jnp.zeros_like(r0),
                tau=r_norm0,
                theta=jnp.zeros((), rdt),
                eta=jnp.zeros((), T),
                alpha=one_t,
                rho=conj_dot(rt, r0, axis_name),
                bound=r_norm0,
                its=jnp.int32(0),
                status=jnp.int32(Status.RUNNING),
                hist=jnp.full(hist_len, jnp.nan, dtype=rdt),
            )

            def cond_fn(s_):
                return (
                    (s_.status == Status.RUNNING)
                    & (s_.its < max_iter)
                    & (s_.bound > tol2)
                )

            def qmr_half(s_x, s_D, tau, theta, eta, alpha, w_new, yM, m_idx):
                """Lines 9-12 of Saad 7.7: quasi-minimization update of one
                half-step (d-recurrence carried as D = M⁻¹d)."""
                # θ²η/α, complex-safe, α guarded (first step has η = 0 so
                # the guarded value never contributes)
                shrink = (theta * theta).astype(T) * eta / jnp.where(
                    jnp.abs(alpha) > tiny, alpha, one_t
                )
                D_new = axpy(shrink, s_D, yM)
                theta_new = norm2(w_new, axis_name) / jnp.maximum(tau, tiny)
                c = one_r / jnp.sqrt(one_r + theta_new * theta_new)
                tau_new = tau * theta_new * c
                eta_new = (c * c).astype(T) * alpha
                x_new = axpy(eta_new, D_new, s_x)
                bound = tau_new * jnp.sqrt(m_idx.astype(rdt) + one_r)
                return x_new, D_new, tau_new, theta_new, eta_new, bound

            def body_fn(s_):
                if hist_len:
                    s_ = s_._replace(
                        hist=s_.hist.at[s_.its].set(s_.bound / rhs_norm)
                    )
                # --- odd half-step m = 2j+1 (Saad lines 5-12)
                sigma = conj_dot(rt, s_.v, axis_name)
                ok_sigma = jnp.abs(sigma) > brk_tol
                alpha = s_.rho / jnp.where(ok_sigma, sigma, one_t)
                w1 = axpy(-alpha, s_.Ay, s_.w)
                x1, D1, tau1, theta1, eta1, _b1 = qmr_half(
                    s_.x, s_.D, s_.tau, s_.theta, s_.eta, alpha, w1, s_.yM,
                    2 * s_.its + 1,
                )
                y_even = axpy(-alpha, s_.v, s_.y)
                yM1 = M.matvec(y_even)
                Ay1 = A.matvec(yM1)
                # --- even half-step m = 2j+2 (lines 8-16)
                w2 = axpy(-alpha, Ay1, w1)
                x2, D2, tau2, theta2, eta2, bound2 = qmr_half(
                    x1, D1, tau1, theta1, eta1, alpha, w2, yM1,
                    2 * s_.its + 2,
                )
                rho_new = conj_dot(rt, w2, axis_name)
                ok = ok_sigma & (jnp.abs(s_.rho) > brk_tol)
                beta = rho_new / jnp.where(ok, s_.rho, one_t)
                y_odd = axpy(beta, y_even, w2)
                yM2 = M.matvec(y_odd)
                Ay2 = A.matvec(yM2)
                v_new = axpy(beta, axpy(beta, s_.v, Ay1), Ay2)

                return _State(
                    x=jnp.where(ok, x2, s_.x),
                    w=jnp.where(ok, w2, s_.w),
                    y=jnp.where(ok, y_odd, s_.y),
                    yM=jnp.where(ok, yM2, s_.yM),
                    Ay=jnp.where(ok, Ay2, s_.Ay),
                    v=jnp.where(ok, v_new, s_.v),
                    D=jnp.where(ok, D2, s_.D),
                    tau=jnp.where(ok, tau2, s_.tau),
                    theta=jnp.where(ok, theta2, s_.theta),
                    eta=jnp.where(ok, eta2, s_.eta),
                    alpha=jnp.where(ok, alpha, s_.alpha),
                    rho=jnp.where(ok, rho_new, s_.rho),
                    bound=jnp.where(ok, bound2, s_.bound),
                    its=jnp.where(ok, s_.its + 1, s_.its),
                    status=jnp.where(
                        ok, s_.status, jnp.int32(Status.BREAKDOWN)
                    ),
                    hist=s_.hist,
                )

            final = lax.while_loop(cond_fn, body_fn, st0)
            # measurement honesty: the loop gate is Freund's bound; report
            # (and gate CONVERGED on) the true residual of the returned x
            true_res = norm2(
                axpy(-one_t, A.matvec(final.x), b), axis_name
            ) / rhs_norm
            converged = (final.status == Status.RUNNING) & (true_res <= tol)
            status = jnp.where(
                converged,
                jnp.int32(Status.CONVERGED),
                jnp.where(
                    final.status == Status.RUNNING,
                    jnp.int32(Status.INSUFFICIENT_ITER),
                    final.status,
                ),
            )
            hist = final.hist
            if hist_len:
                hist = jnp.where(
                    final.status == Status.RUNNING,
                    hist.at[final.its].set(final.bound / rhs_norm),
                    hist,
                )
            return final.x, make_info(final.its, true_res, status), hist

        return lax.cond(r_norm0 <= tol2, early, iterate, None)

    from .bicgstab import _guard3

    x, info, hist = _guard3(b, x0, main, axis_name, hist_len, rdt)
    if record_residuals:
        return x, info, hist
    return x, info
