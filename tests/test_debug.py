"""Debug module: interpret-mode toggle and operator checker."""

import jax.numpy as jnp
import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu import debug
from sprsolve_tpu.utils import problems


def test_check_operator_passes_for_valid_ops():
    A = problems.grid_laplacian_dirichlet((10, 10))
    x = jnp.zeros(100)
    assert debug.check_operator(A, x)
    assert debug.check_operator(A.to_dia(), x)
    assert debug.check_operator(A.to_ell(), x)
    assert debug.check_operator(sp.BSR.from_csr(A, bs=32), x)


def test_check_operator_complex():
    A, _ = problems.hermitian_grid((6, 6))
    assert debug.check_operator(A, jnp.zeros(36, jnp.complex128))


def test_check_operator_catches_nonlinear():
    class Bad:
        shape = (4, 4)

        def matvec(self, x):
            return x * x  # not linear

        def matvec_dot(self, x):
            y = self.matvec(x)
            return y, jnp.vdot(x, y)

    with pytest.raises(AssertionError):
        debug.check_operator(Bad(), jnp.zeros(4))


def test_interpret_kernels_context():
    A = problems.grid_laplacian_dirichlet((16, 16))
    p = sp.PaddedDIA.from_dia(A.to_dia())
    x = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    with debug.interpret_kernels():
        y = p.unpad_vec(p.matvec(p.pad_vec(x)))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.matvec(x)), rtol=1e-12, atol=1e-12
    )
