"""BiCGStab specialized to the Jacobi-preconditioned Pallas DIA path.

Same algorithm as :func:`sprsolve_tpu.solvers.bicgstab` (reference
``src/bicg_stab.rs`` semantics: ρ-restart, ω-guard, breakdown exit, identical
update order), restructured so each iteration is exactly THREE kernel passes
— the minimum cut given the two reduction barriers (α needs the global r0·v,
ω needs the global t·t / t·s):

- K_P: p-update folded into the SpMV window + r0·v partial
  (``ops.pallas_fused.fused_p_call``)
- K_S: s-update folded into the SpMV window + t·t, t·s partials
  (``fused_s_call``)
- K_T: x/r updates + ‖r'‖² and the *next* iteration's ρ = r0·r'
  (``fused_tail_call``) — no standalone dot or axpy pass survives.

The diagonal preconditioner is folded into the band data once at entry
(right preconditioning, A″ = A·D⁻¹: band d scaled by ``diag_inv`` shifted by
its offset), which is arithmetically the reference's y = M⁻¹p, v = A·y chain
(``src/bicg_stab.rs:328-329``) with the multiply rounded at setup instead of
per iteration; K_T reconstructs the x-direction vectors D⁻¹p and D⁻¹s from
body-only reads, so y and z are never materialized.

Restrictions: real dtypes, :class:`PaddedDIA` operator, diagonal
preconditioner given as ``diag_inv`` in padded layout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..errors import Status
from ..ops.pallas_fused import fused_p_call, fused_s_call, fused_tail_call
from ..ops.pallas_spmv import PaddedDIA
from ..vecalg import axpy, eps_for, norm2
from .common import make_info


class _State(NamedTuple):
    x: jax.Array       # body (r_pad, lanes)
    r: jax.Array       # full padded layout (window-consumed)
    r0: jax.Array      # body
    p: jax.Array       # full padded layout
    v: jax.Array       # full padded layout
    rho: jax.Array     # the ρ consumed by the last completed iteration (β's ρ_old)
    rho_next: jax.Array  # r0·r of the carried r (computed ahead in K_T)
    alpha: jax.Array
    w: jax.Array
    r0_norm_tol: jax.Array
    r_norm: jax.Array
    its: jax.Array
    status: jax.Array
    res: jax.Array
    hist: jax.Array


def _shift_flat(flat: jax.Array, off: int) -> jax.Array:
    """flat[i + off] with zero fill — the band-aligned view of a vector."""
    n = flat.shape[0]
    if off == 0:
        return flat
    if off > 0:
        return jnp.concatenate([flat[off:], jnp.zeros(off, flat.dtype)])
    return jnp.concatenate([jnp.zeros(-off, flat.dtype), flat[: n + off]])


def bicgstab_fused(
    A: PaddedDIA,
    b2: jax.Array,
    x02: Optional[jax.Array] = None,
    *,
    diag_inv2: Optional[jax.Array] = None,
    tol,
    max_iter,
    record_residuals: bool = False,
    xla_tail: bool = True,
):
    """Solve A·x = b (padded 2-D layout throughout). Returns ``(x2, SolveInfo)``
    (plus the per-iteration relative-residual trace with
    ``record_residuals=True``, which requires a static ``max_iter``)."""
    if x02 is None:
        x02 = jnp.zeros_like(b2)
    T = b2.dtype
    if jnp.iscomplexobj(b2):
        raise NotImplementedError("bicgstab_fused is real-dtype only")
    rdt = jnp.finfo(T).dtype
    tol = jnp.asarray(tol, dtype=rdt)
    hist_len = int(max_iter) if record_residuals else 0
    max_iter = jnp.asarray(max_iter, dtype=jnp.int32)
    eps = eps_for(T)
    one = jnp.ones((), T)
    zero = jnp.zeros((), T)
    hr, lanes, br = A.hr, A.lanes, A.block_rows
    r_pad = A.r_pad
    halo = jnp.zeros((hr, lanes), dtype=T)

    def with_halo(body):
        return jnp.concatenate([halo, body, halo], axis=0)

    def body_of(full):
        return full[hr : hr + r_pad]

    if diag_inv2 is None:
        dinv_b = jnp.ones((r_pad, lanes), T)
        bands_p = A.bands3
    else:
        dinv_b = body_of(diag_inv2)
        # fold M into the bands: A″ = A·D⁻¹ (band d, flat row i, touches
        # column i + off → scale by dinv[i + off])
        dflat = dinv_b.reshape(-1)
        bands_p = jnp.stack(
            [
                A.bands3[d] * _shift_flat(dflat, off).reshape(r_pad, lanes)
                for d, off in enumerate(A.offsets)
            ]
        )

    def K_P(r_f, p_f, v_f, r0b, beta, omega):
        p_b, v_b, r0v = fused_p_call(
            bands_p, r_f, p_f, v_f, r0b,
            jnp.asarray(beta, T), jnp.asarray(omega, T),
            A.offsets, hr, lanes, br,
        )
        return with_halo(p_b), with_halo(v_b), r0v

    def K_S(r_f, v_f, alpha):
        return fused_s_call(
            bands_p, r_f, v_f, jnp.asarray(alpha, T), A.offsets, hr, lanes, br
        )

    def K_T_pallas(xb, p_f, r_f, v_f, tb, r0b, alpha, omega):
        xb, rb, rn2, rho = fused_tail_call(
            xb, p_f, r_f, v_f, tb, dinv_b, r0b,
            jnp.asarray(alpha, T), jnp.asarray(omega, T), hr, br,
        )
        return xb, with_halo(rb), rn2, rho

    def K_T_xla(xb, p_f, r_f, v_f, tb, r0b, alpha, omega):
        # identical math as the Pallas tail, expressed as jnp ops so XLA
        # multi-output-fuses it with its reductions (measured faster than the
        # 9-operand Pallas tail kernel: windows amplify its reads ~1.3×)
        s = body_of(r_f) - alpha * body_of(v_f)
        xb = xb - alpha * (dinv_b * body_of(p_f)) - omega * (dinv_b * s)
        rn = s - omega * tb
        rn2 = jnp.sum(rn * rn)
        rho = jnp.sum(r0b * rn)
        return xb, with_halo(rn), rn2, rho

    K_T = K_T_xla if xla_tail else K_T_pallas

    def main(rhs_norm):
        tol2 = tol * rhs_norm
        r = axpy(-one, b2, A.matvec(x02))
        r0_norm = norm2(r)

        def early(_):
            hist = jnp.full(hist_len, jnp.nan, dtype=rdt)
            if hist_len:
                hist = hist.at[0].set(r0_norm / rhs_norm)
            return (
                x02,
                make_info(0, r0_norm / rhs_norm, Status.CONVERGED),
                hist,
            )

        def iterate(_):
            r0b = body_of(r)
            r0_norm_tol = (r0_norm * eps) ** 2
            rho0 = r0_norm * r0_norm

            # ---- unrolled first iteration: the generic step with β = 0
            # (p ← r exactly, src/bicg_stab.rs:87-120)
            zeros_f = jnp.zeros_like(r)
            p, v, r0v = K_P(r, zeros_f, zeros_f, r0b, zero, zero)
            alpha = rho0 / r0v
            t_b, tt, ts = K_S(r, v, alpha)
            w = jnp.where(tt > 0, ts / tt, zero)
            x_b, r_new, rn2, rho_next = K_T(
                body_of(x02), p, r, v, t_b, r0b, alpha, w
            )

            hist0 = jnp.full(hist_len, jnp.nan, dtype=rdt)
            if hist_len:
                hist0 = hist0.at[0].set(r0_norm / rhs_norm)
            st = _State(
                x=x_b, r=r_new, r0=r0b, p=p, v=v,
                rho=rho0, rho_next=rho_next,
                alpha=alpha, w=w, r0_norm_tol=r0_norm_tol,
                r_norm=jnp.sqrt(rn2),
                its=jnp.int32(1), status=jnp.int32(Status.RUNNING),
                res=jnp.zeros((), rdt), hist=hist0,
            )

            # convergence tested in cond_fn on the carried ‖r‖ (same
            # top-of-iteration sequence as the reference, see bicgstab.py)
            def cond_fn(s_):
                return (
                    (s_.status == Status.RUNNING)
                    & (s_.its < max_iter)
                    & (s_.r_norm > tol2)
                )

            def body_fn(s_):
                r_norm = s_.r_norm
                if hist_len:
                    s_ = s_._replace(
                        hist=s_.hist.at[s_.its].set(r_norm / rhs_norm)
                    )

                rho_old = s_.rho
                # ρ = r0·r was computed inside the previous K_T pass
                # (s_.rho_next); the ρ-breakdown restart
                # (src/bicg_stab.rs:131-145) recomputes r from scratch with
                # the *unscaled* operator and resets r0.
                def restart(op):
                    rho_, r_, r0b_, tol_ = op
                    r_r = axpy(-one, b2, A.matvec(with_halo(s_.x)))
                    rn = norm2(r_r)
                    return rn * rn, r_r, body_of(r_r), rn * rn * eps * eps

                rho, r_, r0b_, r0_norm_tol = lax.cond(
                    jnp.abs(s_.rho_next) < s_.r0_norm_tol,
                    restart,
                    lambda op: op,
                    (s_.rho_next, s_.r, s_.r0, s_.r0_norm_tol),
                )

                beta = (rho / rho_old) * (s_.alpha / s_.w)
                p, v, r0v = K_P(r_, s_.p, s_.v, r0b_, beta, s_.w)

                def breakdown(s_):
                    return s_._replace(
                        r=r_, r0=r0b_, p=p, v=v, rho=rho, rho_next=rho,
                        r0_norm_tol=r0_norm_tol,
                        status=jnp.int32(Status.BREAKDOWN),
                        res=r_norm / rhs_norm,
                    )

                def advance(s_):
                    alpha = rho / r0v
                    t_b, tt, ts = K_S(r_, v, alpha)
                    w = jnp.where(tt > 0, ts / tt, zero)
                    x_b, r_new, rn2, rho_next = K_T(
                        s_.x, p, r_, v, t_b, r0b_, alpha, w
                    )
                    return _State(
                        x=x_b, r=r_new, r0=r0b_, p=p, v=v,
                        rho=rho, rho_next=rho_next, alpha=alpha, w=w,
                        r0_norm_tol=r0_norm_tol,
                        r_norm=jnp.sqrt(rn2),
                        its=s_.its + 1, status=s_.status, res=s_.res,
                        hist=s_.hist,
                    )

                return lax.cond(jnp.abs(r0v) <= 0, breakdown, advance, s_)

            final = lax.while_loop(cond_fn, body_fn, st)
            converged_exit = (
                (final.status == Status.RUNNING)
                & (final.r_norm <= tol2)
                & (final.its < max_iter)
            )
            status = jnp.where(
                converged_exit,
                jnp.int32(Status.CONVERGED),
                jnp.where(
                    final.status == Status.RUNNING,
                    jnp.int32(Status.INSUFFICIENT_ITER),
                    final.status,
                ),
            )
            res = jnp.where(
                final.status == Status.RUNNING,
                final.r_norm / rhs_norm,
                final.res,
            )
            hist = final.hist
            if hist_len:
                hist = jnp.where(
                    converged_exit,
                    hist.at[final.its].set(final.r_norm / rhs_norm),
                    hist,
                )
            return with_halo(final.x), make_info(final.its, res, status), hist

        return lax.cond(r0_norm <= tol2, early, iterate, None)

    rhs_norm = norm2(b2)

    def trivial(_):
        return (
            jnp.zeros_like(b2),
            make_info(0, rhs_norm, Status.CONVERGED),
            jnp.full(hist_len, jnp.nan, dtype=rdt),
        )

    x, info, hist = lax.cond(
        rhs_norm <= eps_for(T), trivial, lambda _: main(rhs_norm), None
    )
    if record_residuals:
        return x, info, hist
    return x, info
