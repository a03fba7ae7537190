"""Real-planes adapter: run complex solves across a real-only jit boundary.

XLA decomposes complex arithmetic into real planes *inside* a compiled
program, but complex arrays at the jit boundary require backend support for
complex device buffers — which some PJRT backends lack (the axon v5e tunnel
rejects c64 device puts). This adapter moves the re/im split outside the
boundary: inputs and outputs are real plane pairs, the complex view exists
only inside the compiled program.

    solve = with_real_planes(cs_minres)
    x_re, x_im, info = solve(op, b_re, b_im, tol=..., max_iter=...)
"""

from __future__ import annotations

import jax.numpy as jnp


def with_real_planes(solver_fn):
    """Wrap a solver so complex vectors cross the jit boundary as re/im pairs.

    The wrapped signature replaces each complex vector argument with two real
    arrays: ``(A, b_re, b_im, x0_re=None, x0_im=None, **kw)`` →
    ``(x_re, x_im, info)``. The operator must itself be real-plane-safe
    (e.g. :class:`~sprsolve_tpu.ops.pallas_spmv.ComplexPaddedDIA`, whose
    leaves are real band planes, or any real-leaved pytree operator).
    """

    def wrapped(A, b_re, b_im, x0_re=None, x0_im=None, **kwargs):
        b = b_re + 1j * b_im
        if x0_re is not None:
            x0 = x0_re + 1j * (x0_im if x0_im is not None else jnp.zeros_like(x0_re))
        else:
            x0 = None
        x, info = solver_fn(A, b, x0, **kwargs)
        return jnp.real(x), jnp.imag(x), info

    return wrapped
