"""Pallas DIA kernel validation against the XLA oracle, in interpreter mode
(the kernel-debugging path SURVEY.md §5 prescribes in place of sanitizers).
The real-TPU timing/validation happens in bench.py."""


import jax.numpy as jnp
import numpy as np

import sprsolve_tpu.ops.pallas_spmv as ps
from sprsolve_tpu.ops.spmv import spmv_dia
from sprsolve_tpu.utils import problems


def test_poisson3d_matches_oracle():
    A = problems.poisson3d(10, 10, 10, dtype=np.float32)
    dia = A.to_dia()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1000).astype(np.float32))
    want = np.asarray(spmv_dia(dia, x))
    got = np.asarray(ps.spmv_dia_pallas(dia, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid2d_matches_oracle_f64():
    A = problems.grid_laplacian_dirichlet((20, 20))
    dia = A.to_dia()
    x = jnp.asarray(np.random.default_rng(1).standard_normal(400))
    want = np.asarray(spmv_dia(dia, x))
    got = np.asarray(ps.spmv_dia_pallas(dia, x))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_padded_layout_roundtrip():
    A = problems.poisson3d(8, 8, 8, dtype=np.float32)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    x = jnp.asarray(np.random.default_rng(2).standard_normal(512).astype(np.float32))
    x2 = p.pad_vec(x)
    assert x2.shape == (p.hr + p.r_pad + p.hr, p.lanes)
    np.testing.assert_array_equal(np.asarray(p.unpad_vec(x2)), np.asarray(x))


def test_solver_runs_in_padded_layout():
    """The whole Krylov solve can run in the kernel's 2-D layout — vecalg is
    shape-agnostic and the zero halo is preserved by every op."""
    import sprsolve_tpu as sp

    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    dia = A.to_dia()
    p = ps.PaddedDIA.from_dia(dia)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(512))
    x2, info = sp.bicgstab(p, p.pad_vec(b), p.pad_vec(jnp.zeros(512)), tol=1e-12, max_iter=500)
    info.raise_if_error()
    x = p.unpad_vec(x2)
    r = np.asarray(A.matvec(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10


def test_fused_matvec_dot_matches_unfused():
    A = problems.poisson3d(10, 10, 10, dtype=np.float64)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    x = jnp.asarray(np.random.default_rng(4).standard_normal(1000))
    x2 = p.pad_vec(x)
    y_fused, d_fused = p.matvec_dot(x2)
    y_ref = p.matvec(x2)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), rtol=1e-14)
    want = np.vdot(np.asarray(x2), np.asarray(y_ref))
    np.testing.assert_allclose(float(d_fused), want, rtol=1e-12)


def test_minres_uses_fused_dotmv_in_pallas_layout():
    import sprsolve_tpu as sp

    A, rhs = problems.sym_grid_laplacian((16, 16))
    p = ps.PaddedDIA.from_dia(A.to_dia())
    b2 = p.pad_vec(jnp.asarray(rhs))
    x2, info = sp.minres(p, b2, tol=1e-12, max_iter=600)
    info.raise_if_error()
    x = p.unpad_vec(x2)
    r = np.asarray(A.matvec(x)) - rhs
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-9


def test_fused_orth_norm_matches_unfused():
    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    rng = np.random.default_rng(5)
    a2 = p.pad_vec(jnp.asarray(rng.standard_normal(512)))
    v0 = p.pad_vec(jnp.asarray(rng.standard_normal(512)))
    v1 = p.pad_vec(jnp.asarray(rng.standard_normal(512)))
    beta, alpha = jnp.float64(0.7), jnp.float64(-1.3)
    vn, sumsq = p.orth_norm(a2, v0, v1, beta, alpha)
    want = a2 - beta * v0 - alpha * v1
    np.testing.assert_allclose(
        np.asarray(vn), np.asarray(want), rtol=1e-13, atol=1e-14
    )
    np.testing.assert_allclose(
        float(sumsq), float(jnp.sum(want * want)), rtol=1e-12
    )


def test_complex_conj_dotmv_matches_composed():
    """matvec_conj_dot == (A·conj(x), conj_dot(x, A·conj(x))) on the
    two-plane kernel (interpret mode)."""
    import numpy as np

    from sprsolve_tpu.ops.pallas_spmv import ComplexPaddedDIA
    from sprsolve_tpu.sparse.containers import CSR
    from sprsolve_tpu.utils import problems
    import jax.numpy as jnp

    A0 = problems.poisson3d(8, 8, 8)
    rng = np.random.default_rng(0)
    data = (np.asarray(A0.data) * (1 - 0.6j)).astype(np.complex64)
    cop = ComplexPaddedDIA.from_csr(
        CSR.from_arrays(data, A0.indices, A0.indptr, A0.shape),
        lanes=128, block_rows=8,
    )
    x = rng.standard_normal(512).astype(np.float32) + 1j * rng.standard_normal(
        512
    ).astype(np.float32)
    x2 = cop.pad_vec(jnp.asarray(x.astype(np.complex64)))
    y_f, d_f = cop.matvec_conj_dot(x2)
    y_c = cop.matvec(jnp.conj(x2))
    d_c = jnp.sum(jnp.conj(x2) * y_c)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=2e-5,
                               atol=2e-5)
    assert abs(complex(d_f) - complex(d_c)) < 1e-2 * max(1.0, abs(complex(d_c)))


def test_wide_band_geometry_autofits_vmem():
    """Round-5 regression: 32 unnarrowable f32 bands at the shipped
    (1024, 256) geometry blew the 64M scoped-VMEM budget and the kernel
    compile-failed on chip.  from_dia must shrink block_rows to fit the
    double-buffered band stream (verified on chip: compiles, bit-exact,
    163.6 Gnnz/s at 1M rows) while narrow few-band cases keep the tuned
    default."""
    from sprsolve_tpu.ops.pallas_spmv import BLOCK_ROWS, PaddedDIA
    from sprsolve_tpu.ops.spmv import spmv_dia
    from sprsolve_tpu.sparse.containers import DIA

    # geometry decisions (pure host logic)
    assert PaddedDIA._fit_block_rows(256, 7, 1024, 8, 1) == 256
    assert PaddedDIA._fit_block_rows(256, 7, 1024, 8, 4) == 256
    assert PaddedDIA._fit_block_rows(256, 32, 1024, 8, 4) < 256
    assert PaddedDIA._fit_block_rows(256, 64, 1024, 8, 4) <= 128

    # wide-band correctness through the (interpreted) kernel
    n = 1 << 13
    rng = np.random.default_rng(0)
    offs = tuple(sorted({0, 1, -1, 5, -5, 17, -17, 130, -130, 700, -700,
                         23, -23, 64, -64, 9}))
    bands = rng.standard_normal((len(offs), n)).astype(np.float32)
    for d, o in enumerate(offs):
        if o > 0:
            bands[d, n - o:] = 0
        elif o < 0:
            bands[d, :(-o)] = 0
    dia = DIA(bands=jnp.asarray(bands), offsets=offs, shape=(n, n))
    p = PaddedDIA.from_dia(dia, lanes=128, block_rows=BLOCK_ROWS)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    got = np.asarray(p.unpad_vec(p.matvec(p.pad_vec(x))))
    want = np.asarray(spmv_dia(dia, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
