"""Persisted per-shape kernel autotune cache.

The Pallas DIA kernels ship defaults measured on a v5e (lanes=1024,
block_rows=256 — the tables at the top of ``ops/pallas_spmv.py``), but the
best block geometry shifts with matrix size, band count, and device
generation.  This module is the ``mkl_sparse_set_mv_hint`` +
``mkl_sparse_optimize`` analog (reference: ``src/mkl_mat.rs:81-148``) taken
one step further: measured winners PERSIST across processes, keyed by
(kernel kind, device kind, dtype, band count, size bucket), so the one-time
cost of a tuning sweep is paid once per shape class, not per run.

- :func:`tune_padded_dia` / :func:`tune_complex_padded_dia`: measure the
  candidate (lanes, block_rows) grid on the current backend, persist the
  winner, return the tuned operator.
- ``PaddedDIA.from_dia`` / ``ComplexPaddedDIA.from_dia`` consult the cache
  automatically when the caller does not pass an explicit geometry —
  explicit arguments always win; with no cache entry the shipped defaults
  apply.

Cache location: ``$SPRSOLVE_TUNE_CACHE`` or
``~/.cache/sprsolve_tpu/autotune.json``.  Writes are atomic
(tmp + rename); a corrupt or unreadable file degrades to the defaults.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


def _cache_path() -> str:
    p = os.environ.get("SPRSOLVE_TUNE_CACHE")
    if p:
        return p
    return os.path.join(
        os.path.expanduser("~"), ".cache", "sprsolve_tpu", "autotune.json"
    )


_MEM = {"path": None, "mtime": None, "data": {}}


def _load() -> dict:
    path = _cache_path()
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return {}
    if _MEM["path"] == path and _MEM["mtime"] == mtime:
        return _MEM["data"]
    try:
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            data = {}
    except (OSError, ValueError):
        data = {}
    _MEM.update(path=path, mtime=mtime, data=data)
    return data


def _save(data: dict) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _MEM.update(path=None, mtime=None, data={})  # invalidate the memo


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _bucket(n: int) -> int:
    """Size bucket: next power of two — one entry serves a 2× size range."""
    return 1 << max(int(n) - 1, 0).bit_length()


def _key(kind: str, dtype, nbands: int, n: int) -> str:
    return f"{kind}|{_device_kind()}|{np.dtype(dtype).name}|b{nbands}|n{_bucket(n)}"


def lookup(kind: str, dtype, nbands: int, n: int) -> Optional[dict]:
    """The persisted winner for this shape class, or None."""
    ent = _load().get(_key(kind, dtype, nbands, n))
    if isinstance(ent, dict) and "lanes" in ent and "block_rows" in ent:
        return ent
    return None


def store(kind: str, dtype, nbands: int, n: int, config: dict,
          metric_gnnz_s: float) -> None:
    data = dict(_load())
    data[_key(kind, dtype, nbands, n)] = {
        "lanes": int(config["lanes"]),
        "block_rows": int(config["block_rows"]),
        "gnnz_s": round(float(metric_gnnz_s), 3),
        "tuned_at": int(time.time()),
    }
    _save(data)


# ---------------------------------------------------------------------------
# layout-choice persistence (optimize(measure=True))


def pattern_sig(n: int, nnz: int, indptr, indices) -> str:
    """Stable 16-hex signature of a sparsity pattern (size + sampled
    structure).  Keys the measured-layout cache: re-running the same
    problem skips the measurement pass entirely."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    h.update(np.asarray([n, nnz], np.int64).tobytes())
    ip = np.asarray(indptr, np.int64)
    ix = np.asarray(indices, np.int64)
    h.update(np.ascontiguousarray(ip[:: max(1, len(ip) // 64)]).tobytes())
    h.update(np.ascontiguousarray(ix[:: max(1, len(ix) // 64)]).tobytes())
    return h.hexdigest()


def _layout_key(sig: str, dtype) -> str:
    return f"layout|{_device_kind()}|{np.dtype(dtype).name}|{sig}"


def lookup_layout(sig: str, dtype) -> Optional[str]:
    """The persisted winning layout label for this pattern, or None."""
    ent = _load().get(_layout_key(sig, dtype))
    if isinstance(ent, dict) and "label" in ent:
        return str(ent["label"])
    return None


def store_layout(sig: str, dtype, label: str, gnnz_s: float) -> None:
    data = dict(_load())
    data[_layout_key(sig, dtype)] = {
        "label": str(label),
        "gnnz_s": round(float(gnnz_s), 3),
        "tuned_at": int(time.time()),
    }
    _save(data)


# ---------------------------------------------------------------------------
# measurement


def _time_step(step, x, iters: int) -> float:
    """Chained x ← step(x) inside one dispatch (the loop-carried dependency
    prevents hoisting); returns seconds per apply.  ``step`` must be
    shape-preserving; scale inside it to keep f32 from overflowing."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(v, n_iters):
        def body(_, v):
            return step(v)

        return jax.lax.fori_loop(0, n_iters, body, v, unroll=1)

    def run(n):
        out = chain(x, jnp.int32(n))
        # completion via a scalar fetch (dtype-agnostic: complex-safe)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    run(2)  # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run(iters)
        ts.append(time.perf_counter() - t0)
    return max(min(ts) / iters, 1e-12)


DIA_CANDIDATES = ((1024, 128), (1024, 256), (1024, 512), (512, 256),
                  (512, 512))


def tune_padded_dia(m, candidates=DIA_CANDIDATES, iters: int = 50,
                    verbose: bool = False):
    """Measure the (lanes, block_rows) candidates for this DIA matrix on
    the current backend, persist the winner, return the tuned ``PaddedDIA``.

    Candidates whose geometry is invalid for the matrix (or fail to
    compile) are skipped.  Falls back to the shipped defaults when nothing
    survives.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_spmv import PaddedDIA

    n = m.shape[0]
    nnz = sum(n - abs(o) for o in m.offsets)
    bands_dt = np.asarray(m.bands).dtype
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.asarray(m.bands).real.dtype))
    scale = jnp.asarray(0.125, x.dtype)
    best = None
    for lanes, br in candidates:
        try:
            op = PaddedDIA.from_dia(m, lanes=lanes, block_rows=br)
            x2 = jax.block_until_ready(op.pad_vec(x))
            t = _time_step(lambda v, op=op: op.matvec(v) * scale, x2, iters)
        except Exception as e:  # invalid geometry / compile failure: skip
            if verbose:
                print(f"  ({lanes}, {br}): skipped ({type(e).__name__})")
            continue
        if verbose:
            print(f"  ({lanes}, {br}): {nnz/t/1e9:.2f} Gnnz/s")
        if best is None or t < best[0]:
            best = (t, lanes, br, op)
    if best is None:
        return PaddedDIA.from_dia(m)
    t, lanes, br, op = best
    store("dia", bands_dt, len(m.offsets), n,
          {"lanes": lanes, "block_rows": br}, nnz / t / 1e9)
    return op


def tune_complex_padded_dia(m, candidates=DIA_CANDIDATES, iters: int = 50,
                            verbose: bool = False):
    """Complex (two-plane) variant of :func:`tune_padded_dia`."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_spmv import ComplexPaddedDIA

    n = m.shape[0]
    nnz = sum(n - abs(o) for o in m.offsets)
    bands_dt = np.asarray(m.bands).dtype
    rng = np.random.default_rng(0)
    rdt = np.asarray(m.bands).real.dtype
    xr = jnp.asarray(rng.standard_normal(n).astype(rdt))
    xi = jnp.asarray(rng.standard_normal(n).astype(rdt))
    best = None
    for lanes, br in candidates:
        try:
            from ..ops.pallas_spmv import _dia_complex_pallas_call

            op = ComplexPaddedDIA.from_dia(m, lanes=lanes, block_rows=br)
            p = op.re
            x2 = (
                jax.block_until_ready(p.pad_vec(xr)),
                jax.block_until_ready(p.pad_vec(xi)),
            )
            scale = jnp.asarray(0.125, xr.dtype)
            halo = jnp.zeros((p.hr, p.lanes), rdt)

            def mv(pair, op=op, p=p, halo=halo):
                # real-planes boundary (tunnel-safe: no complex buffers)
                yr, yi = _dia_complex_pallas_call(
                    op.re.bands3, op.im.bands3, pair[0], pair[1],
                    p.offsets, p.hr, p.lanes, p.block_rows,
                )
                return (
                    jnp.concatenate([halo, yr * scale, halo]),
                    jnp.concatenate([halo, yi * scale, halo]),
                )

            t = _time_step(mv, x2, iters)
        except Exception as e:
            if verbose:
                print(f"  ({lanes}, {br}): skipped ({type(e).__name__})")
            continue
        if verbose:
            print(f"  ({lanes}, {br}): {nnz/t/1e9:.2f} Gcnnz/s")
        if best is None or t < best[0]:
            best = (t, lanes, br, op)
    if best is None:
        return ComplexPaddedDIA.from_dia(m)
    t, lanes, br, op = best
    store("cdia", bands_dt, len(m.offsets), n,
          {"lanes": lanes, "block_rows": br}, nnz / t / 1e9)
    return op
