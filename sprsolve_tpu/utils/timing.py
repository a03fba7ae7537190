"""Timing / profiling / roofline harness.

The reference's only perf instrumentation is criterion benches and MKL hint
calls (SURVEY.md §5 "Tracing/profiling: none in-library").  Here observability
is first-class:

- :func:`time_fn` — dispatch-overhead-compensated wall timing of a jitted
  callable (the device tunnel in some environments costs ~ms per call, so
  single-call timing measures the runtime, not the chip).
- :func:`spmv_report` — nnz/s + achieved-bandwidth + roofline fraction for an
  operator, the per-kernel roofline reporting BASELINE.md asks for.
- :func:`trace` — context manager around ``jax.profiler`` for on-demand
  device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax

# public per-chip HBM bandwidth numbers (GB/s) for roofline accounting
HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 100.0,  # placeholder for host runs
}


def detect_chip() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    if "v6" in kind:
        return "v6e"
    return "cpu"


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median-free simple timing: total/iters after warmup, one dispatch per
    call. For sub-ms kernels prefer chaining inside one jit (see bench.py)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass
class SpmvReport:
    seconds: float
    nnz: int
    bytes_algorithmic: int
    chip: str

    @property
    def gnnz_per_s(self) -> float:
        return self.nnz / self.seconds / 1e9

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_algorithmic / self.seconds / 1e9

    @property
    def roofline_fraction(self) -> float:
        return self.achieved_gbps / HBM_GBPS[self.chip]

    def __str__(self) -> str:
        return (
            f"SpMV: {self.seconds*1e3:.3f} ms, {self.gnnz_per_s:.2f} Gnnz/s, "
            f"{self.achieved_gbps:.0f} GB/s "
            f"({100*self.roofline_fraction:.0f}% of {self.chip} HBM roofline)"
        )


def dia_bytes(n: int, n_diags: int, itemsize: int = 4) -> int:
    """Algorithmic-minimum traffic for a DIA SpMV: bands + x + y once each."""
    return (n_diags * n + 2 * n) * itemsize


def ell_bytes(n: int, k: int, itemsize: int = 4) -> int:
    """ELL SpMV: data + int32 cols + x + y."""
    return (k * n) * (itemsize + 4) + 2 * n * itemsize


def spmv_report(seconds: float, nnz: int, bytes_algorithmic: int) -> SpmvReport:
    return SpmvReport(
        seconds=seconds,
        nnz=nnz,
        bytes_algorithmic=bytes_algorithmic,
        chip=detect_chip(),
    )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sprsolve_tpu_trace"):
    """``with trace(): run_solve()`` → device trace viewable in XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
