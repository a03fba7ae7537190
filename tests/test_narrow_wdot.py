"""Narrow exact band storage + the fused w-dot kernel (round 2).

Narrowing must be lossless by construction: any band set that does not
round-trip exactly stays f32, and a narrowed operator must produce
bit-identical results to the f32-stored one (the kernel widens in VMEM
before the FMA)."""

import jax.numpy as jnp
import numpy as np

import sprsolve_tpu.ops.pallas_spmv as ps
from sprsolve_tpu.sparse.containers import DIA
from sprsolve_tpu.utils import problems


def _rand_x(p, n, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return p.pad_vec(jnp.asarray(rng.standard_normal(n).astype(dtype)))


def test_narrow_detection_tiers():
    A = problems.poisson3d(8, 8, 8, dtype=np.float32)
    dia = A.to_dia()
    # integer bands in [-128, 127] → int8
    assert ps.PaddedDIA.from_dia(dia).bands3.dtype == jnp.int8
    # 2.5 is exact in bfloat16 but not an integer → bf16
    b25 = DIA(bands=np.asarray(dia.bands) * np.float32(2.5),
              offsets=dia.offsets, shape=dia.shape)
    assert ps.PaddedDIA.from_dia(b25).bands3.dtype == jnp.bfloat16
    # 1/3 rounds in bf16 → stays f32
    b3 = DIA(bands=np.asarray(dia.bands) / np.float32(3.0),
             offsets=dia.offsets, shape=dia.shape)
    assert ps.PaddedDIA.from_dia(b3).bands3.dtype == jnp.float32
    # narrow=False opt-out
    assert ps.PaddedDIA.from_dia(dia, narrow=False).bands3.dtype == jnp.float32


def test_narrow_matvec_bit_identical():
    A = problems.poisson3d(8, 8, 8, dtype=np.float32)
    dia = A.to_dia()
    p_narrow = ps.PaddedDIA.from_dia(dia)
    p_f32 = ps.PaddedDIA.from_dia(dia, narrow=False)
    assert p_narrow.dtype == jnp.float32  # compute dtype unchanged
    x2 = _rand_x(p_f32, 512, 0)
    np.testing.assert_array_equal(
        np.asarray(p_narrow.matvec(x2)), np.asarray(p_f32.matvec(x2))
    )
    y_n, d_n = p_narrow.matvec_dot(x2)
    y_f, d_f = p_f32.matvec_dot(x2)
    np.testing.assert_array_equal(np.asarray(y_n), np.asarray(y_f))
    assert float(d_n) == float(d_f)


def test_narrow_jacobi_diagonal_widened():
    A = problems.poisson3d(6, 6, 6, dtype=np.float32)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    M = p.jacobi_precond()
    assert M.diag_inv.dtype == jnp.float32
    body = np.asarray(M.diag_inv)[p.hr : p.hr + p.r_pad].reshape(-1)[: p.n]
    np.testing.assert_allclose(body, 1.0 / 6.0, rtol=1e-7)


def test_matvec_wdot_matches_unfused():
    A = problems.poisson3d(10, 10, 10, dtype=np.float32)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    x2 = _rand_x(p, 1000, 1)
    w2 = _rand_x(p, 1000, 2)
    y, wd, yd = p.matvec_wdot(x2, w2)
    y_ref = p.matvec(x2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)
    np.testing.assert_allclose(
        float(wd), float(jnp.vdot(w2, y_ref)), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(yd), float(jnp.vdot(y_ref, y_ref)), rtol=1e-4
    )


def test_mv_wdot_generic_fallback():
    """Operators without matvec_wdot take the compose path with identical
    semantics (conj-linear in w, c128 included)."""
    from sprsolve_tpu.ops.operator import mv_wdot, mv_wdot2

    A, rhs, _ = problems.hermitian_grid_with_diag((6, 6))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(36) + 1j * rng.standard_normal(36))
    w = jnp.asarray(rng.standard_normal(36) - 1j * rng.standard_normal(36))
    y, wd = mv_wdot(A, x, w)
    y2, wd2, yd2 = mv_wdot2(A, x, w)
    y_ref = A.matvec(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-13)
    np.testing.assert_allclose(complex(wd), complex(jnp.vdot(w, y_ref)), rtol=1e-12)
    np.testing.assert_allclose(complex(wd2), complex(wd), rtol=1e-15)
    np.testing.assert_allclose(
        complex(yd2), complex(jnp.vdot(y_ref, y_ref)), rtol=1e-12
    )


def test_bicgstab_degenerate_system_never_false_converges():
    """On a nilpotent system r0·v hits exactly 0 in the *unrolled first
    iteration* (which, like the reference's src/bicg_stab.rs:87-120, is
    unguarded — the BreakDown check only exists in the main loop). The
    predicated loop must then terminate without claiming convergence."""
    import sprsolve_tpu as sp
    from sprsolve_tpu.errors import Status
    from sprsolve_tpu.ops.operator import as_operator

    A = as_operator(jnp.asarray(np.array([[0.0, 0.0], [1.0, 0.0]])))
    b = jnp.asarray(np.array([1.0, 0.0]))
    x, info = sp.bicgstab(A, b, tol=1e-30, max_iter=50)
    assert int(info.status) != int(Status.CONVERGED)


def test_wdot_prec_matches_composed():
    """matvec_wdot_prec == (A·(dinv⊙x), dots) vs the composed path
    (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp

    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems

    A = problems.poisson3d(8, 8, 8, dtype=np.float32)
    p = PaddedDIA.from_dia(A.to_dia(), lanes=128, block_rows=8)
    rng = np.random.default_rng(0)
    x = p.pad_vec(jnp.asarray(rng.standard_normal(512), jnp.float32))
    w = p.pad_vec(jnp.asarray(rng.standard_normal(512), jnp.float32))
    M = p.jacobi_precond()
    y_f, wd_f, yd_f = p.matvec_wdot_prec(x, w, M.diag_inv)
    u = x * M.diag_inv
    y_c = p.matvec(u)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=2e-5,
                               atol=2e-6)
    assert abs(float(wd_f) - float(jnp.sum(w * y_c))) < 1e-2
    assert abs(float(yd_f) - float(jnp.sum(y_c * y_c))) < 1e-2


def test_bicgstab_jacobi_padded_fused_converges():
    import numpy as np
    import jax.numpy as jnp

    import sprsolve_tpu as sp
    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems

    A = problems.poisson3d(8, 8, 8, dtype=np.float32)
    p = PaddedDIA.from_dia(A.to_dia(), lanes=128, block_rows=8)
    b = p.pad_vec(jnp.asarray(
        np.random.default_rng(1).standard_normal(512), jnp.float32))
    x, info = sp.bicgstab(p, b, M=p.jacobi_precond(), tol=1e-5, max_iter=500)
    info.raise_if_error()
    r = p.matvec(x) - b
    from sprsolve_tpu.vecalg import norm2
    assert float(norm2(r)) / float(norm2(b)) < 1e-4


def _complex_op(seed=0, side=12):
    A, rhs, _ = problems.complex_symmetric_grid_with_diag(
        (side, side), dtype=np.complex64
    )
    op = ps.ComplexPaddedDIA.from_dia(A.to_dia())
    rng = np.random.default_rng(seed)
    n = A.shape[0]
    mk = lambda s: op.pad_vec(jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
    ))
    return A, op, mk(1), mk(2)


def test_complex_wdot_matches_unfused():
    """Fused two-plane w-dot (conj(w)·A·x and ‖A·x‖² in the SpMV pass)
    must match the composed matvec + conj_dot path."""
    from sprsolve_tpu.vecalg import conj_dot

    A, op, x2, w2 = _complex_op()
    y_ref = op.matvec(x2)
    y, wd, yd = op.matvec_wdot(x2, w2)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        complex(wd), complex(conj_dot(w2, y_ref)), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        complex(yd), complex(conj_dot(y_ref, y_ref)), rtol=2e-4, atol=2e-3
    )
    # w = x dedup path (both w streams dropped)
    y2, wd2, yd2 = op.matvec_wdot(x2, x2)
    np.testing.assert_allclose(
        complex(wd2), complex(conj_dot(x2, y_ref)), rtol=2e-4, atol=2e-3
    )


def test_complex_wdot_cprec_matches_composed():
    """Complex-Jacobi-folded w-dot: u = M⁻¹x computed in VMEM must match
    the composed apply→matvec→dots path."""
    from sprsolve_tpu.vecalg import conj_dot

    A, op, x2, w2 = _complex_op(seed=3)
    M = op.jacobi_precond()
    u_ref = x2 * (M.inv_re + 1j * M.inv_im).astype(x2.dtype)
    y_ref = op.matvec(u_ref)
    y, wd, yd = op.matvec_wdot_cprec(x2, w2, M.inv_re, M.inv_im)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        complex(wd), complex(conj_dot(w2, y_ref)), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        complex(yd), complex(conj_dot(y_ref, y_ref)), rtol=2e-4, atol=2e-3
    )


def test_complex_bicgstab_fused_prec_converges():
    """End-to-end: complex BiCGStab + ComplexDiagPrecond rides the fused
    cprec kernel (mv_prec_wdot dispatch) and still converges to the
    manufactured solution."""
    import sprsolve_tpu as sp

    A, rhs, _ = problems.complex_symmetric_grid_with_diag(
        (8, 8), dtype=np.complex64
    )
    op = ps.ComplexPaddedDIA.from_dia(A.to_dia())
    b2 = op.pad_vec(jnp.asarray(rhs.astype(np.complex64)))
    M = op.jacobi_precond()
    x2, info = sp.bicgstab(op, b2, M=M, tol=1e-5, max_iter=300)
    info.raise_if_error()
    x = np.asarray(op.unpad_vec(x2))
    x_known = np.array([complex(i, j) for i in range(8) for j in range(8)])
    assert np.abs(x - x_known).max() < 1e-3
