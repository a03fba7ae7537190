"""On-chip (lanes, block_rows) bake-off with forced-iteration rtt-corrected
timing and device-side correctness checks vs the XLA oracle.

Run: python tools/probe_blocks.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
import sprsolve_tpu as sp
from sprsolve_tpu.ops.pallas_spmv import PaddedDIA
from sprsolve_tpu.utils import problems

print("device:", jax.devices()[0], flush=True)

def rtt():
    t0 = time.perf_counter(); jax.device_get(jnp.zeros(())); return time.perf_counter() - t0

A = problems.poisson3d(100, 100, 100, dtype=np.float32)
dia = A.to_dia()
nnz = A.nnz
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))

@jax.jit
def chain(p, v, n_iters):
    def body(i, vv):
        s = jnp.where(i % 2 == 0, jnp.float32(0.125), jnp.float32(8.0))
        return p.matvec(vv) * s
    return jax.lax.fori_loop(0, n_iters, body, v)

CONFIGS = [(512, 512), (512, 768), (1024, 128), (1024, 256)]
for lanes, br in CONFIGS:
    p = PaddedDIA.from_dia(dia, lanes=lanes, block_rows=br)
    x2 = jax.block_until_ready(p.pad_vec(x))
    jax.block_until_ready(chain(p, x2, 1))
    best = []
    N = 2000  # ~40 ms compute >> 36 ms rtt
    for _ in range(4):
        r0 = rtt()
        t0 = time.perf_counter(); jax.block_until_ready(chain(p, x2, N)); t1 = time.perf_counter()
        best.append((t1 - t0 - r0) / N)
    t = min(best)
    print(f"spmv lanes={lanes} br={br}: {t*1e6:.2f} us -> {nnz/t/1e9:.1f} Gnnz/s "
          f"({[f'{nnz/tt/1e9:.0f}' for tt in best]})", flush=True)

for lanes, br in CONFIGS:
    p = PaddedDIA.from_dia(dia, lanes=lanes, block_rows=br)
    b2 = p.pad_vec(b)
    M = p.jacobi_precond()
    FB, FM = 2000, 3000  # forced iterations: compute >> rtt
    run_b = jax.jit(lambda a, bb, m: sp.bicgstab(a, bb, M=m, tol=0.0, max_iter=FB)[1].residual)
    run_m = jax.jit(lambda a, bb: sp.minres(a, bb, tol=0.0, max_iter=FM)[1].residual)
    float(run_b(p, b2, M)); float(run_m(p, b2))
    tb, tm = [], []
    for _ in range(3):
        r0 = rtt(); t0 = time.perf_counter(); float(run_b(p, b2, M)); tb.append(time.perf_counter()-t0-r0)
        r0 = rtt(); t0 = time.perf_counter(); float(run_m(p, b2)); tm.append(time.perf_counter()-t0-r0)
    print(f"e2e lanes={lanes} br={br}: bicgstab {min(tb)/FB*1e6:.1f} us/iter, "
          f"minres {min(tm)/FM*1e6:.1f} us/iter", flush=True)
