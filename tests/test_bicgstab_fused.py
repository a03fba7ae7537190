"""Fused BiCGStab: agreement with the generic solver (interpret mode)."""


import jax.numpy as jnp
import numpy as np

import sprsolve_tpu as sp
import sprsolve_tpu.ops.pallas_fused as pf
import sprsolve_tpu.ops.pallas_spmv as ps
from sprsolve_tpu.utils import problems


def test_fused_kernels_match_unfused():
    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    p = ps.PaddedDIA.from_dia(A.to_dia())
    rng = np.random.default_rng(0)
    xin = p.pad_vec(jnp.asarray(rng.standard_normal(512)))
    aux = p.pad_vec(jnp.asarray(rng.standard_normal(512)))
    dinv = p.jacobi_precond().diag_inv

    z_b, t_b, d0, d1 = pf.fused_mz_call(
        p.bands3, xin, dinv, aux, p.offsets, p.hr, p.lanes, p.block_rows, "aux"
    )
    z_want = xin * dinv
    t_want = p.matvec(z_want)
    body = slice(p.hr, p.hr + p.r_pad)
    np.testing.assert_allclose(np.asarray(z_b), np.asarray(z_want[body]), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_want[body]), rtol=1e-12)
    np.testing.assert_allclose(float(d0), float(jnp.vdot(aux, t_want)), rtol=1e-12)

    _, t_b2, tt, ts = pf.fused_mz_call(
        p.bands3, xin, dinv, aux, p.offsets, p.hr, p.lanes, p.block_rows, "self"
    )
    np.testing.assert_allclose(float(tt), float(jnp.vdot(t_want, t_want)), rtol=1e-12)
    np.testing.assert_allclose(float(ts), float(jnp.vdot(t_want, xin)), rtol=1e-12)


def test_fused_solver_matches_generic():
    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    dia = A.to_dia()
    p = ps.PaddedDIA.from_dia(dia)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(512))
    b2 = p.pad_vec(b)
    M = p.jacobi_precond()

    x_gen, info_gen = sp.bicgstab(p, b2, M=M, tol=1e-12, max_iter=500)
    x_fus, info_fus = sp.bicgstab_fused(
        p, b2, diag_inv2=M.diag_inv, tol=1e-12, max_iter=500
    )
    info_gen.raise_if_error()
    info_fus.raise_if_error()
    # fp fusion reshuffles summation; solutions agree to solver tolerance
    xg, xf = np.asarray(p.unpad_vec(x_gen)), np.asarray(p.unpad_vec(x_fus))
    r = np.asarray(A.matvec(jnp.asarray(xf))) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10
    assert abs(int(info_gen.iterations) - int(info_fus.iterations)) <= 3
    np.testing.assert_allclose(xf, xg, rtol=1e-7, atol=1e-9)
