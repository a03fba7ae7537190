"""On-chip benchmark: mixed-precision refinement vs direct f64 CG (1M rows).

Run: python tools/probe_refine.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import sprsolve_tpu as sp
from sprsolve_tpu.utils import problems

print("device:", jax.devices()[0], flush=True)

def rtt():
    t0 = time.perf_counter(); jax.device_get(jnp.zeros(())); return time.perf_counter() - t0

# 1M-row Poisson, f64 accuracy target 1e-12
A = problems.poisson3d(100, 100, 100, dtype=np.float64)
n = A.shape[0]
b = np.random.default_rng(0).standard_normal(n)

t0 = time.perf_counter()
x, info = sp.refine_solve(A, b, inner="cg", tol=1e-12, inner_tol=1e-5,
                          inner_max_iter=400)
jax.block_until_ready(x)
t_compile = time.perf_counter() - t0
print(f"refine: {int(info.iterations)} outer steps, status {int(info.status)}, "
      f"rel-res {float(info.residual):.2e}, first call {t_compile:.1f}s", flush=True)
# true residual on host
import jax.numpy as jnp
r = np.asarray(A.matvec(jnp.asarray(b*0 + np.asarray(x)))) - b
print("true rel-res:", np.linalg.norm(r)/np.linalg.norm(b), flush=True)

# steady-state timing (jit cached inside refine_solve's lambda? NO - each call
# re-jits the lambda; time the underlying jitted fn by calling refine directly)
from sprsolve_tpu.solvers import refine, cg
from sprsolve_tpu.ops.optimize import optimize
from sprsolve_tpu.sparse.containers import CSR
A64 = A.to_dia()
A32 = optimize(CSR.from_arrays(np.asarray(A.data, np.float32), A.indices, A.indptr, A.shape))
run = jax.jit(lambda a64, a32, bb, xx0: refine(a64, a32, bb, xx0, inner=cg,
              tol=1e-12, inner_tol=1e-5, inner_max_iter=400))
b64 = jnp.asarray(b); z = jnp.zeros_like(b64)
xx, ii = run(A64, A32, b64, z); jax.block_until_ready(xx)
ts = []
for _ in range(3):
    r0 = rtt(); t0 = time.perf_counter()
    jax.block_until_ready(run(A64, A32, b64, z)[0])
    ts.append(time.perf_counter() - t0 - r0)
print(f"refine steady-state: {min(ts)*1e3:.1f} ms "
      f"({int(ii.iterations)} outer, rel-res {float(ii.residual):.2e})", flush=True)

# baseline: direct f64 CG on the XLA DIA path to the same tolerance
runf64 = jax.jit(lambda a, bb: cg(a, bb, tol=1e-12, max_iter=2000))
xf, inf64 = runf64(A64, b64); jax.block_until_ready(xf)
ts2 = []
for _ in range(2):
    r0 = rtt(); t0 = time.perf_counter()
    jax.block_until_ready(runf64(A64, b64)[0])
    ts2.append(time.perf_counter() - t0 - r0)
print(f"direct f64 CG (XLA DIA): {min(ts2)*1e3:.1f} ms "
      f"({int(inf64.iterations)} iters, rel-res {float(inf64.residual):.2e})", flush=True)
