"""vecalg unit tests — port of the reference inline tests
(``src/vecalg.rs:609-842``): every primitive for f32/f64/c64/c128, the
conjugate-linearity of conj_dot, real-scalar scaling of complex vectors, and
the axpby doc-test values (``src/vecalg.rs:123-132``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sprsolve_tpu import vecalg

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def _mk(dtype, n=37, seed=0):
    rng = np.random.default_rng(seed)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        a = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    else:
        a = rng.standard_normal(n)
    return jnp.asarray(a, dtype=dtype)


def _tol(dtype):
    return 1e-5 if jnp.finfo(dtype).bits <= 64 and dtype in (
        jnp.float32,
        jnp.complex64,
    ) else 1e-12


@pytest.mark.parametrize("dtype", DTYPES)
def test_dot_no_conjugation(dtype):
    x, y = _mk(dtype, seed=1), _mk(dtype, seed=2)
    expected = np.sum(np.asarray(x) * np.asarray(y))
    np.testing.assert_allclose(vecalg.dot(x, y), expected, rtol=_tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
def test_conj_dot_conjugate_linear_first_arg(dtype):
    x, y = _mk(dtype, seed=3), _mk(dtype, seed=4)
    expected = np.sum(np.conj(np.asarray(x)) * np.asarray(y))
    np.testing.assert_allclose(vecalg.conj_dot(x, y), expected, rtol=_tol(dtype))
    # doc-test of src/vecalg.rs:36-46: constant vectors
    a = jnp.full(100, 4 + 3j, dtype=jnp.complex128)
    b = jnp.full(100, 2 - 3j, dtype=jnp.complex128)
    t = np.conj(4 + 3j) * (2 - 3j) * 100
    np.testing.assert_allclose(vecalg.conj_dot(a, b), t, rtol=1e-14)


@pytest.mark.parametrize("dtype", DTYPES)
def test_norm2(dtype):
    x = _mk(dtype, seed=5)
    np.testing.assert_allclose(
        vecalg.norm2(x), np.linalg.norm(np.asarray(x)), rtol=_tol(dtype)
    )
    assert not jnp.iscomplexobj(vecalg.norm2(x))


@pytest.mark.parametrize("dtype", DTYPES)
def test_axpy_axpby(dtype):
    x, y = _mk(dtype, seed=6), _mk(dtype, seed=7)
    a = jnp.asarray(2.5, dtype=dtype)
    np.testing.assert_allclose(
        vecalg.axpy(a, x, y), np.asarray(y) + 2.5 * np.asarray(x), rtol=_tol(dtype)
    )
    b = jnp.asarray(-1.5, dtype=dtype)
    np.testing.assert_allclose(
        vecalg.axpby(a, x, b, y),
        2.5 * np.asarray(x) - 1.5 * np.asarray(y),
        rtol=_tol(dtype),
    )


def test_axpby_doctest_values():
    # src/vecalg.rs:123-132: axpby(2, ones, -1, twos) == 0
    a = jnp.ones(128, dtype=jnp.float32)
    b = jnp.full(128, 2.0, dtype=jnp.float32)
    out = vecalg.axpby(jnp.float32(2.0), a, jnp.float32(-1.0), b)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(128, np.float32))


@pytest.mark.parametrize("dtype", [jnp.complex64, jnp.complex128])
def test_rscale_real_scalar_on_complex(dtype):
    # the reference supports real-scalar x complex-vector (src/vecalg.rs:84-92)
    x = _mk(dtype, seed=8)
    rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    s = jnp.asarray(0.75, dtype=rdt)
    out = vecalg.rscale(s, x)
    assert out.dtype == dtype
    np.testing.assert_allclose(out, 0.75 * np.asarray(x), rtol=_tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
def test_conj(dtype):
    x = _mk(dtype, seed=9)
    np.testing.assert_array_equal(
        np.asarray(vecalg.conj(x)), np.conj(np.asarray(x))
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_scale(dtype):
    x = _mk(dtype, seed=10)
    a = jnp.asarray(-1.25, dtype=dtype)
    np.testing.assert_allclose(vecalg.scale(a, x), -1.25 * np.asarray(x), rtol=_tol(dtype))


def test_abs2():
    z = jnp.asarray([3 + 4j, 1 - 1j], dtype=jnp.complex128)
    np.testing.assert_allclose(vecalg.abs2(z), [25.0, 2.0])
    assert not jnp.iscomplexobj(vecalg.abs2(z))
