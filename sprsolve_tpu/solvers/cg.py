"""Preconditioned Conjugate Gradients for SPD / Hermitian-PD systems.

Not present in the reference (its SPD solver is MINRES, ``src/minres.rs``);
added for framework completeness — CG is the flagship SPD Krylov method of
every sparse library (cf. ``scipy.sparse.linalg.cg``) and is strictly
cheaper per iteration than MINRES (one SpMV, two reductions, no Givens
machinery).  Follows this package's solver conventions: ``lax.while_loop``
carry as the workspace, status codes in the carry, reductions ride the
operator's fused forms, ``axis_name`` makes it distributed-collective.

The α-dot is conj(p)·(A·p) — exactly the operator's fused ``matvec_dot``
(the reference's ``mul_vec_dot`` / MKL dotmv shape, ``src/mat.rs:19-22``),
so the per-iteration structure is one fused SpMV pass plus one (r·z, ‖r‖)
tail pass, the same single-reduction-barrier shape that makes MINRES fast
on the TPU.

Breakdown semantics: pᴴAp ≤ 0 (operator not positive definite on the
Krylov space) terminates with ``Status.BREAKDOWN`` and the last iterate,
in the spirit of the reference's BiCGStab r0·v = 0 exit
(``src/bicg_stab.rs:164-167``).
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
    r: jax.Array
    z: jax.Array       # M⁻¹·r of the carried r
    p: jax.Array
    rz: jax.Array      # T scalar: conj(r)·z of the carried vectors
    r_norm: jax.Array  # real scalar: ‖r‖ of the carried r (checked in cond)
    its: jax.Array
    status: jax.Array
    res: jax.Array
    hist: jax.Array


def cg(
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
    """Solve SPD A·x = b with (preconditioned) CG. Returns ``(x, SolveInfo)``.

    ``M`` must be an SPD preconditioner apply (≈ A⁻¹), e.g.
    :class:`~sprsolve_tpu.precond.DiagPrecond` or
    :class:`~sprsolve_tpu.precond.IC0Precond`.  Convergence test is
    ‖r‖ ≤ tol·‖b‖ on the true recurrence residual, checked at the top of
    each iteration like the package's other Krylov solvers.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    check_shapes(A, b, x0, axis_name)
    if M is None:
        M = IdentityOperator(b.shape[0])

    rdt = jnp.finfo(b.dtype).dtype if not jnp.iscomplexobj(b) else jnp.real(b).dtype
    tol = jnp.asarray(tol, dtype=rdt)
    # +1: the final write lands at hist[its] with its == max_iter when
    # convergence hits exactly at the budget
    hist_len = int(max_iter) + 1 if record_residuals else 0
    max_iter = jnp.asarray(max_iter, dtype=jnp.int32)
    eps = eps_for(b.dtype)
    T = b.dtype

    def main(rhs_norm):
        tol2 = tol * rhs_norm

        r = axpy(-jnp.ones((), T), A.matvec(x0), b)  # r = b − A·x
        r_norm = norm2(r, axis_name)
        z = M.matvec(r)
        st = _State(
            x=x0, r=r, z=z, p=z,
            rz=conj_dot(r, z, axis_name),
            r_norm=r_norm,
            its=jnp.int32(0), status=jnp.int32(Status.RUNNING),
            res=jnp.zeros((), rdt),
            hist=jnp.full(hist_len, jnp.nan, dtype=rdt),
        )

        def cond_fn(s_):
            return (
                (s_.status == Status.RUNNING)
                & (s_.its < max_iter)
                & (s_.r_norm > tol2)
            )

        def body_fn(s_):
            if hist_len:
                s_ = s_._replace(
                    hist=s_.hist.at[s_.its].set(s_.r_norm / rhs_norm)
                )
            # fused SpMV + conj(p)·A·p (local partial under shard_map —
            # the collective sum is the solver's job, as in minres)
            q, pq = A.matvec_dot(s_.p)
            if axis_name is not None:
                pq = lax.psum(pq, axis_name)
            # positive-definiteness gate as predicated arithmetic (cheap,
            # terminal, rare — same scheme as BiCGStab's breakdown exit)
            ok = jnp.real(pq) > 0
            alpha = s_.rz / jnp.where(ok, pq, jnp.ones((), T))
            x = axpy(alpha, s_.p, s_.x)
            r = axpy(-alpha, q, s_.r)
            z = M.matvec(r)
            rz_new = conj_dot(r, z, axis_name)
            beta = rz_new / s_.rz
            p = axpy(beta, s_.p, z)  # p = z + β·p
            return _State(
                x=jnp.where(ok, x, s_.x),
                r=r, z=z, p=p, rz=rz_new,
                r_norm=jnp.where(ok, norm2(r, axis_name), s_.r_norm),
                its=jnp.where(ok, s_.its + 1, s_.its),
                status=jnp.where(ok, s_.status, jnp.int32(Status.BREAKDOWN)),
                res=jnp.where(ok, s_.res, s_.r_norm / rhs_norm),
                hist=s_.hist,
            )

        final = lax.while_loop(cond_fn, body_fn, st)

        converged_exit = (
            (final.status == Status.RUNNING) & (final.r_norm <= tol2)
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
            final.status == Status.RUNNING, final.r_norm / rhs_norm, final.res
        )
        hist = final.hist
        if hist_len:
            hist = jnp.where(
                converged_exit,
                hist.at[final.its].set(final.r_norm / rhs_norm),
                hist,
            )
        return final.x, make_info(final.its, res, status), hist

    rhs_norm = norm2(b, axis_name)

    def trivial(_):
        return (
            jnp.zeros_like(x0),
            make_info(0, rhs_norm, Status.CONVERGED),
            jnp.full(hist_len, jnp.nan, dtype=rdt),
        )

    x, info, hist = lax.cond(
        rhs_norm <= eps, trivial, lambda _: main(rhs_norm), None
    )
    if record_residuals:
        return x, info, hist
    return x, info
