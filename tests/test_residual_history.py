"""record_residuals buffer semantics shared across the Krylov family.

Regression for ADVICE r3 (bicgstabl.py:319 class of bug): when convergence
lands exactly at the max_iter-th iteration/cycle, the final converged
residual is written at hist[max_iter] — with a (max_iter,)-length buffer
the JAX scatter was silently dropped and the trace's last entry went
missing.  The buffer is (max_iter+1,): hist[i] = relative residual after i
iterations.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

import sprsolve_tpu as sp


def _diag_dominant(n=120, seed=3):
    A = sps.random(n, n, density=0.05, random_state=seed)
    A = A + sps.diags(np.abs(A).sum(axis=1).A1 + 1.0)
    return A.tocsr()


def _spd(n=120, seed=3):
    A = sps.random(n, n, density=0.05, random_state=seed)
    A = A @ A.T + sps.eye(n) * 4.0
    return A.tocsr()


# bicgstab is absent by design: its reference-parity loop semantics
# (src/bicg_stab.rs:122-126 — the convergence check runs at the TOP of each
# iteration, so the loop range ends before a check at its == max_iter could
# fire) make exact-budget convergence INSUFFICIENT_ITER, as in the
# reference; see test_exact_budget_is_insufficient_for_reference_parity.
@pytest.mark.parametrize(
    "method", ["bicgstabl", "cgs", "tfqmr", "cg", "lsqr"]
)
def test_converged_entry_recorded_at_exact_budget(method):
    S = _spd() if method == "cg" else _diag_dominant()
    A = sp.csr_from_scipy(S)
    b = jnp.asarray(np.random.default_rng(7).standard_normal(S.shape[0]))
    fn = getattr(sp, method)

    # pass 1: find the natural convergence count
    _, info0, _ = fn(A, b, tol=1e-10, max_iter=500, record_residuals=True)
    info0.raise_if_error()
    its = int(info0.iterations)
    assert 0 < its < 500

    # pass 2: budget == exact convergence count — the final write lands at
    # hist[its] with its == max_iter
    x, info, hist = fn(A, b, tol=1e-10, max_iter=its, record_residuals=True)
    info.raise_if_error()
    assert int(info.iterations) == its
    h = np.asarray(hist)
    assert h.shape[0] == its + 1
    assert np.isfinite(h[its]), "converged entry at hist[max_iter] dropped"
    # the recorded quantity is the solver's cheap per-iteration estimate
    # (recurrence norm / TFQMR bound), which can sit a small factor from
    # info.residual's true residual — only its presence and magnitude are
    # the contract here
    assert h[its] <= 1e-8


def test_exact_budget_is_insufficient_for_reference_parity():
    """BiCGStab mirrors the reference exactly: the convergence check runs
    at the top of each iteration (src/bicg_stab.rs:123-126), so a solve
    whose residual first meets tol on the max_iter-th iteration reports
    InsufficientIterNum — the check that would observe it never runs."""
    S = _diag_dominant()
    A = sp.csr_from_scipy(S)
    b = jnp.asarray(np.random.default_rng(7).standard_normal(S.shape[0]))
    _, info0 = sp.bicgstab(A, b, tol=1e-10, max_iter=500)
    its = int(info0.iterations)
    _, info, hist = sp.bicgstab(
        A, b, tol=1e-10, max_iter=its, record_residuals=True
    )
    assert int(info.status) == int(sp.Status.INSUFFICIENT_ITER)
    # ...but the residual it reports is honest (already below tol)
    assert float(info.residual) <= 1e-10

