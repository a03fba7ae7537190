"""Tour of the eigensolver surface: which method for which eigenpairs.

The reference has no eigensolver (its surface is linear solvers,
``src/lib.rs:15-21``); this framework adds a full one.  The decision tree:

- spectrum ENDS (smallest/largest)      -> lobpcg (+ a preconditioner at
  scale: multigrid is the difference between converging and not)
- interior near sigma, general           -> shift_invert_eigs (LOBPCG on
  (A - sigma I)^-1, tolerant of inexact inner solves — owns deep-interior
  at large n)
- interior near sigma, spacing there not
  too dense (see docs/solvers.md regime) -> rational_filter_eigs
  (FEAST-style contour filter; batched complex-shifted COCG inner solves)
- any of the above, row-partitioned      -> parallel.distributed_lobpcg /
  distributed_shift_invert_eigs / distributed_rational_filter_eigs

Run: python examples/eigen_tour.py   (CPU is fine)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import numpy as np

import sprsolve_tpu as sp
from sprsolve_tpu.errors import Status
from sprsolve_tpu.utils import problems


def main():
    side = 24
    n = side * side
    A, _ = problems.sym_grid_laplacian((side, side))
    A = dataclasses.replace(A, data=-A.data)   # SPD grid Laplacian

    import scipy.sparse as sps

    S = sps.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=A.shape,
    )
    w = np.linalg.eigvalsh(S.toarray())        # dense oracle for the demo

    # --- spectrum ends: LOBPCG (Jacobi M; at scale use GridMGPrecond)
    lam, X, info = sp.solvers.lobpcg(
        A.to_dia(), np.random.default_rng(0).standard_normal((n, 4)),
        M=sp.DiagPrecond.new(np.asarray(A.diagonal())),
        tol=1e-8, max_iter=200,
    )
    print(f"lobpcg smallest-4: {Status(int(info.status)).name}, "
          f"lam {np.sort(np.asarray(lam))} (oracle {w[:4]})")

    # --- interior, shift-invert: k nearest sigma via (A - sigma I)^-1
    sigma = 2.0
    lam_si, _, info_si = sp.shift_invert_eigs(A, 3, sigma, tol=1e-6)
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:3]])
    print(f"shift-invert nearest {sigma}: {Status(int(info_si.status)).name}, "
          f"lam {np.sort(np.asarray(lam_si))} (oracle {want})")

    # --- interior, rational filter: contour quadrature of the resolvent
    lam_rf, _, info_rf = sp.rational_filter_eigs(A, 3, sigma, tol=1e-8)
    print(f"rational-filter nearest {sigma}: "
          f"{Status(int(info_rf.status)).name}, "
          f"lam {np.sort(np.asarray(lam_rf))} (oracle {want})")

    # --- scipy calling convention
    from sprsolve_tpu import scipy_compat

    w_sc, _ = scipy_compat.eigsh(A, k=3, which="SA", tol=1e-8)
    print(f"scipy_compat.eigsh SA: lam {np.sort(w_sc)} (oracle {w[:3]})")


if __name__ == "__main__":
    main()
