"""Matrix Market IO: round-trips, symmetry expansion, scipy cross-checks."""

import io

import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.utils.io import mmread, mmwrite


def _rt(A, **kw):
    buf = io.StringIO()
    mmwrite(buf, A, **kw)
    buf.seek(0)
    return mmread(buf)


def test_coordinate_roundtrip_real(tmp_path):
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((9, 7)) * (rng.random((9, 7)) < 0.3)
    A = sp.csr_from_dense(dense)
    path = tmp_path / "a.mtx"
    mmwrite(path, A, comment="test matrix\nsecond line")
    B = mmread(path)
    np.testing.assert_allclose(np.asarray(B.todense()), dense, atol=1e-15)


def test_coordinate_roundtrip_complex():
    rng = np.random.default_rng(1)
    dense = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
             ) * (rng.random((6, 6)) < 0.4)
    B = _rt(sp.csr_from_dense(dense))
    np.testing.assert_allclose(np.asarray(B.todense()), dense, atol=1e-15)


def test_symmetric_storage_expansion():
    rng = np.random.default_rng(2)
    low = np.tril(rng.standard_normal((8, 8)) * (rng.random((8, 8)) < 0.5))
    dense = low + np.triu(low.T, 1)
    B = _rt(sp.csr_from_dense(dense), symmetry="symmetric")
    np.testing.assert_allclose(np.asarray(B.todense()), dense, atol=1e-15)


def test_parse_symmetries_from_text():
    hermitian = """%%MatrixMarket matrix coordinate complex hermitian
% a comment
3 3 3
1 1 2.0 0.0
2 1 1.0 -1.0
3 3 4.0 0.0
"""
    A = mmread(io.StringIO(hermitian))
    d = np.asarray(A.todense())
    want = np.array([[2, 1 + 1j, 0], [1 - 1j, 0, 0], [0, 0, 4]], complex)
    np.testing.assert_allclose(d, want)

    skew = """%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 3.0
"""
    d = np.asarray(mmread(io.StringIO(skew)).todense())
    np.testing.assert_allclose(d, np.array([[0, -3.0], [3.0, 0]]))

    pattern = """%%MatrixMarket matrix coordinate pattern general
2 3 2
1 3
2 1
"""
    d = np.asarray(mmread(io.StringIO(pattern)).todense())
    np.testing.assert_allclose(d, np.array([[0, 0, 1.0], [1.0, 0, 0]]))


def test_array_format():
    dense = np.arange(12.0).reshape(3, 4)
    buf = io.StringIO()
    mmwrite(buf, dense)
    buf.seek(0)
    got = mmread(buf)
    assert isinstance(got, np.ndarray)
    np.testing.assert_allclose(got, dense)


def test_array_symmetric_text():
    # 3x3 symmetric array file: lower triangle column-major
    text = """%%MatrixMarket matrix array real symmetric
3 3
1.0
2.0
3.0
4.0
5.0
6.0
"""
    got = mmread(io.StringIO(text))
    want = np.array([[1, 2, 3], [2, 4, 5], [3, 5, 6.0]])
    np.testing.assert_allclose(got, want)


def test_duplicates_summed():
    text = """%%MatrixMarket matrix coordinate real general
2 2 3
1 1 1.0
1 1 2.5
2 2 1.0
"""
    d = np.asarray(mmread(io.StringIO(text)).todense())
    np.testing.assert_allclose(d, np.array([[3.5, 0], [0, 1.0]]))


def test_bad_header_raises():
    with pytest.raises(ValueError):
        mmread(io.StringIO("%%NotMatrixMarket nope\n1 1 0\n"))


def test_cross_check_scipy(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(3)
    dense = rng.standard_normal((11, 5)) * (rng.random((11, 5)) < 0.3)
    path = tmp_path / "x.mtx"
    mmwrite(path, sp.csr_from_dense(dense))
    ref = scipy_io.mmread(str(path)).toarray()
    np.testing.assert_allclose(ref, dense, atol=1e-15)
    # and read scipy's own output
    path2 = tmp_path / "y.mtx"
    import scipy.sparse as ssp

    scipy_io.mmwrite(str(path2), ssp.csr_matrix(dense))
    got = mmread(path2)
    np.testing.assert_allclose(np.asarray(got.todense()), dense, atol=1e-12)


def test_solve_from_mtx_end_to_end():
    from sprsolve_tpu.utils import problems

    A = problems.grid_laplacian_dirichlet((10, 10))
    buf = io.StringIO()
    mmwrite(buf, A)
    buf.seek(0)
    A2 = mmread(buf)
    b = np.zeros(100)
    problems.set_boundary_condition(b, (10, 10), lambda r, c: float(r + c))
    x, info = sp.solve(A2, b, tol=1e-12, max_iter=500)
    info.raise_if_error()
    import jax.numpy as jnp

    r = np.asarray(A.matvec(jnp.asarray(x, jnp.float64))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_csr_from_bcoo_interop():
    pytest.importorskip("jax.experimental.sparse")
    from jax.experimental import sparse as jsparse

    rng = np.random.default_rng(7)
    dense = rng.standard_normal((9, 6)) * (rng.random((9, 6)) < 0.4)
    bcoo = jsparse.BCOO.fromdense(dense)
    A = sp.csr_from_bcoo(bcoo)
    np.testing.assert_allclose(np.asarray(A.todense()), dense, atol=1e-14)
    # and a solve through it (square case)
    d2 = rng.standard_normal((20, 20)) * (rng.random((20, 20)) < 0.3)
    d2 += np.eye(20) * 8.0
    A2 = sp.csr_from_bcoo(jsparse.BCOO.fromdense(d2))
    b = rng.standard_normal(20)
    x, info = sp.solve(A2, b, tol=1e-12, max_iter=500)
    info.raise_if_error()
    assert np.linalg.norm(d2 @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-10


def test_bcoo_padded_nse():
    from jax.experimental import sparse as jsparse

    dense = np.array([[1.0, 0.0], [0.0, 2.0]])
    b = jsparse.BCOO.fromdense(dense, nse=4)  # 2 real + 2 padding slots
    A = sp.csr_from_bcoo(b)
    np.testing.assert_allclose(np.asarray(A.todense()), dense, atol=1e-15)


def test_hermitian_and_skew_write_roundtrip():
    herm = np.array([[2.0, 1 + 1j], [1 - 1j, 3.0]], complex)
    got = np.asarray(_rt(sp.csr_from_dense(herm), symmetry="hermitian").todense())
    np.testing.assert_allclose(got, herm, atol=1e-15)

    skew = np.array([[0.0, -3.0, 1.5], [3.0, 0.0, 0.25],
                     [-1.5, -0.25, 0.0]])
    got = np.asarray(_rt(sp.csr_from_dense(skew), symmetry="skew-symmetric").todense())
    np.testing.assert_allclose(got, skew, atol=1e-15)


def test_array_skew_symmetric_text():
    # strictly-lower triangle only, column-major (diagonal implied 0)
    text = """%%MatrixMarket matrix array real skew-symmetric
3 3
2.0
3.0
4.0
"""
    got = mmread(io.StringIO(text))
    want = np.array([[0, -2, -3], [2, 0, -4], [3, 4, 0.0]])
    np.testing.assert_allclose(got, want)
