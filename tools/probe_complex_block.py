"""On-chip bake-off of ComplexPaddedDIA block_rows (scoped-vmem limited).

Run from anywhere: python tools/probe_complex_block.py
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

from sprsolve_tpu.utils.problems import poisson3d
from sprsolve_tpu.ops.pallas_spmv import ComplexPaddedDIA, _dia_complex_pallas_call
from sprsolve_tpu.sparse.containers import DIA as _DIA

print("device:", jax.devices()[0])
csr = poisson3d(100, 100, 100)
dia = csr.to_dia()
n = dia.shape[0]
nnz = csr.nnz
cbands = (np.asarray(dia.bands) * (1.0 + 0.5j)).astype(np.complex64)
x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

def rtt():
    t0 = time.perf_counter(); jax.device_get(jnp.zeros(())); return time.perf_counter() - t0

for br in (192, 256, 384, 512):
    try:
        cop = ComplexPaddedDIA.from_dia(
            _DIA(bands=cbands, offsets=dia.offsets, shape=dia.shape), block_rows=br
        )
        p_re = cop.re
        halo = jnp.zeros((p_re.hr, p_re.lanes), jnp.float32)
        xr2 = jax.block_until_ready(p_re.pad_vec(x))
        xi2 = jax.block_until_ready(p_re.pad_vec(x * jnp.float32(0.5)))

        @jax.jit
        def cchain(op_, pair, n_iters):
            def bodyf(_, pr):
                yr, yi = _dia_complex_pallas_call(
                    op_.re.bands3, op_.im.bands3, pr[0], pr[1],
                    op_.re.offsets, op_.re.hr, op_.re.lanes, op_.re.block_rows,
                )
                s_ = jnp.float32(0.125)
                return (jnp.concatenate([halo, yr * s_, halo]),
                        jnp.concatenate([halo, yi * s_, halo]))
            return jax.lax.fori_loop(0, n_iters, bodyf, pair, unroll=1)

        def crun(nit):
            out = cchain(cop, (xr2, xi2), jnp.int32(nit))
            float(out[0].ravel()[0])

        crun(500)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter(); crun(500); ts.append(time.perf_counter() - t0)
        t_c = max((min(ts) - rtt()) / 500, 1e-9)
        print(f"block_rows={br}: {t_c*1e3:.3f} ms -> {nnz/t_c/1e9:.2f} Gcnnz/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"block_rows={br}: FAILED {type(e).__name__}: {msg}")
