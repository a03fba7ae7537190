"""Round-3 probe: where do BiCGStab's 83 µs/iter go?

Times, on the 1M-row Poisson in the padded kernel layout:
  1. plain SpMV kernel chain
  2. matvec_wdot chain (one extra window operand + 2 SMEM partials)
  3. matvec_wdot_prec chain (adds the dinv window)
  4. representative XLA elementwise passes (p-update, x-update, r-update)
  5. the full bicgstab forced loop (reference point)

Decision input for VERDICT r3 item 5 (push toward the two-SpMV floor):
which streams are worth folding, and whether the XLA passes are
bandwidth-bound (fold wins ~4.3 MB/stream) or fusion-bound (fold wins more).
"""

import time
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sprsolve_tpu as sp
    from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
    from sprsolve_tpu.utils import problems
    from bench import measure_rtt, time_solve_periter

    A = problems.poisson3d(100, 100, 100, dtype=np.float32)
    n = A.shape[0]
    dia = A.to_dia()
    p = PaddedDIA.from_dia(dia)
    rng = np.random.default_rng(0)
    x2 = jax.block_until_ready(
        p.pad_vec(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
    )
    w2 = jax.block_until_ready(
        p.pad_vec(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
    )
    dinv2 = jax.block_until_ready(p.jacobi_precond().diag_inv)

    def chain_time(body, iters=1000):
        @jax.jit
        def chain(x, nit, bump):
            x = x * (jnp.ones((), x.dtype) + bump)

            def f(_, x):
                return body(x)

            return jax.lax.fori_loop(0, nit, f, x, unroll=1)

        def run(k):
            out = chain(x2, jnp.int32(iters), jnp.float32(k * 2**-16))
            float(out.ravel()[0])

        run(0)
        ts = []
        for k in range(3):
            t0 = time.perf_counter()
            run(k + 1)
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - measure_rtt()) / iters, 1e-9)

    s8 = jnp.float32(0.125)

    t_mv = chain_time(lambda x: p.matvec(x) * s8)
    log(f"matvec chain:            {t_mv*1e6:8.1f} us")

    def body_wdot(x):
        y, wd, yd = p.matvec_wdot(x, w2)
        return y * (s8 + wd * jnp.float32(1e-38) + yd * jnp.float32(1e-38))

    t_wd = chain_time(body_wdot)
    log(f"matvec_wdot chain:       {t_wd*1e6:8.1f} us")

    def body_wdp(x):
        y, wd, yd = p.matvec_wdot_prec(x, w2, dinv2)
        return y * (s8 + wd * jnp.float32(1e-38) + yd * jnp.float32(1e-38))

    t_wdp = chain_time(body_wdp)
    log(f"matvec_wdot_prec chain:  {t_wdp*1e6:8.1f} us")

    # XLA pass shapes (carried x; w2/dinv2 fixed operands)
    from sprsolve_tpu.vecalg import axpby, axpy

    t_p = chain_time(
        lambda x: axpy(jnp.ones((), jnp.float32), w2,
                       axpby(jnp.float32(-0.3), dinv2, jnp.float32(0.9), x))
    )
    log(f"p-update pass (3 reads): {t_p*1e6:8.1f} us")

    t_x = chain_time(
        lambda x: x - jnp.float32(0.1) * (dinv2 * w2)
        - jnp.float32(0.2) * (dinv2 * x)
    )
    log(f"x-update-ish (3 reads):  {t_x*1e6:8.1f} us")

    def body_r(x):
        r = x - jnp.float32(0.3) * w2
        rho = jnp.sum(dinv2 * r)
        rn = jnp.sum(r * r)
        return r * (s8 + rho * jnp.float32(1e-38) + rn * jnp.float32(1e-38))

    t_r = chain_time(body_r)
    log(f"r-update + 2 dots pass:  {t_r*1e6:8.1f} us")

    # full solver reference point
    b2 = jax.block_until_ready(
        p.pad_vec(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
    )
    M = p.jacobi_precond()
    t_it = time_solve_periter(
        lambda mi: jax.jit(lambda: sp.bicgstab(p, b2, M=M, tol=0.0, max_iter=mi))
    )
    log(f"bicgstab full iteration: {t_it*1e6:8.1f} us")
    log(
        f"2 kernels = {2*t_wdp*1e6:.1f} us; XLA share = "
        f"{(t_it - 2*t_wdp)*1e6:.1f} us"
    )


if __name__ == "__main__":
    main()
