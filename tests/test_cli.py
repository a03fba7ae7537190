"""CLI entry (__main__): info and solve subcommands, end to end."""

import numpy as np
import pytest

import sprsolve_tpu as sp
from sprsolve_tpu.__main__ import main
from sprsolve_tpu.utils import problems
from sprsolve_tpu.utils.io import mmwrite


@pytest.fixture()
def lap_mtx(tmp_path):
    A = problems.grid_laplacian_dirichlet((10, 10))
    p = tmp_path / "lap.mtx"
    mmwrite(p, A)
    b = np.zeros(100)
    problems.set_boundary_condition(b, (10, 10), lambda r, c: float(r + c))
    bp = tmp_path / "b.npy"
    np.save(bp, b)
    return A, str(p), b, str(bp)


def test_info(lap_mtx, capsys):
    _, path, _, _ = lap_mtx
    assert main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "100 x 100" in out and "symmetric" in out


def test_solve_writes_solution(lap_mtx, tmp_path, capsys):
    A, path, b, bpath = lap_mtx
    out = tmp_path / "x.npy"
    rc = main([
        "solve", path, "--rhs", bpath, "--method", "bicgstab",
        "--precond", "jacobi", "--tol", "1e-12", "--max-iter", "1500",
        "--out", str(out),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "CONVERGED" in text
    x = np.load(out)
    r = np.asarray(A.matvec(x)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_solve_default_rhs_and_amg(lap_mtx, capsys):
    # the Dirichlet Laplacian is nonsymmetric (identity boundary rows):
    # bicgstab is the right method; amg rides it fine
    _, path, _, _ = lap_mtx
    rc = main(["solve", path, "--method", "bicgstab", "--precond", "amg",
               "--tol", "1e-10", "--max-iter", "2000"])
    assert rc == 0
    assert "CONVERGED" in capsys.readouterr().out


def test_solve_bad_rhs_length(lap_mtx, tmp_path, capsys):
    _, path, _, _ = lap_mtx
    bad = tmp_path / "bad.npy"
    np.save(bad, np.ones(7))
    assert main(["solve", path, "--rhs", str(bad)]) == 2


def test_solve_refine_flag(lap_mtx, capsys):
    A, path, b, bpath = lap_mtx
    rc = main(["solve", path, "--rhs", bpath, "--method", "bicgstab",
               "--precond", "jacobi", "--refine", "--tol", "1e-13",
               "--max-iter", "20"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "CONVERGED" in out and "[refined]" in out
    # true residual reported by the CLI is already checked against 'rel-res'
    rel = float(out.split("true rel-res ")[1].split(",")[0])
    assert rel < 1e-12


@pytest.fixture()
def sym_mtx(tmp_path):
    A, _rhs = problems.sym_grid_laplacian((8, 8))
    p = tmp_path / "sym.mtx"
    mmwrite(p, A)
    return A, str(p)


def test_solve_auto_picks_minres(sym_mtx, capsys):
    _, path = sym_mtx
    rc = main(["solve", path, "--tol", "1e-10", "--max-iter", "500"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("minres") and "CONVERGED" in out


def test_eig_smallest(sym_mtx, capsys):
    A, path = sym_mtx
    rc = main(["eig", path, "-k", "3", "--which", "SA", "--tol", "1e-8"])
    assert rc == 0
    out = capsys.readouterr().out
    lams = [float(line.split("=")[1].split()[0])
            for line in out.splitlines() if "lambda[" in line]
    dense = np.zeros(A.shape)
    for i in range(A.shape[0]):
        x = np.zeros(A.shape[0]); x[i] = 1.0
        dense[:, i] = np.asarray(A.matvec(x))
    ref = np.sort(np.linalg.eigvalsh(dense))[:3]
    assert np.allclose(sorted(lams), ref, rtol=1e-5, atol=1e-8)


def test_eig_shift_invert(sym_mtx, capsys):
    A, path = sym_mtx
    dense = np.zeros(A.shape)
    for i in range(A.shape[0]):
        x = np.zeros(A.shape[0]); x[i] = 1.0
        dense[:, i] = np.asarray(A.matvec(x))
    full = np.linalg.eigvalsh(dense)
    sigma = float((full[3] + full[4]) / 2)  # between two interior eigenvalues
    rc = main(["eig", path, "-k", "2", "--which", "LM",
               "--sigma", repr(sigma), "--tol", "1e-8"])
    assert rc == 0
    out = capsys.readouterr().out
    lams = [float(line.split("=")[1].split()[0])
            for line in out.splitlines() if "lambda[" in line]
    ref = sorted(full, key=lambda l: abs(l - sigma))[:2]
    assert np.allclose(sorted(lams), sorted(ref), rtol=1e-5, atol=1e-8)


def test_eig_lm_without_sigma_errors(sym_mtx, capsys):
    _, path = sym_mtx
    assert main(["eig", path, "--which", "LM"]) == 2
    assert "--sigma" in capsys.readouterr().err


def test_eig_mg_precond(tmp_path, capsys):
    """--precond mg --grid: the production path for structured operators —
    multigrid-preconditioned LOBPCG (round-4; measured on chip at 1M rows
    it is the difference between converging in 21 iters and stalling)."""
    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    p = tmp_path / "p3d.mtx"
    mmwrite(p, A)
    rc = main(["eig", str(p), "-k", "2", "--tol", "1e-7",
               "--precond", "mg", "--grid", "8,8,8"])
    assert rc == 0
    out = capsys.readouterr().out
    lams = [float(line.split("=")[1].split()[0])
            for line in out.splitlines() if "lambda[" in line]
    import math

    l1 = 3 * (2 * math.sin(math.pi / 18)) ** 2
    assert abs(lams[0] - l1) < 1e-6
    # guard rails: mg without grid, wrong grid size, precond with sigma
    assert main(["eig", str(p), "--precond", "mg"]) == 2
    assert main(["eig", str(p), "--precond", "mg", "--grid", "4,4,4"]) == 2
    assert main(["eig", str(p), "--precond", "jacobi", "--sigma", "1.0"]) == 2


def test_eigsh_precond_extension():
    """scipy_compat.eigsh(precond=...): jacobi string and prebuilt MG."""
    from sprsolve_tpu import scipy_compat

    A = problems.poisson3d(8, 8, 8, dtype=np.float64)
    M = sp.GridMGPrecond.from_csr(A, (8, 8, 8))
    w, v = scipy_compat.eigsh(A, k=2, which="SA", tol=1e-8, maxiter=100,
                              precond=M)
    import math

    l1 = 3 * (2 * math.sin(math.pi / 18)) ** 2
    assert abs(float(w[0]) - l1) < 1e-6
    w2 = scipy_compat.eigsh(A, k=2, which="SA", tol=1e-8, maxiter=200,
                            precond="jacobi", return_eigenvectors=False)
    assert abs(float(w2[0]) - l1) < 1e-6
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        scipy_compat.eigsh(A, k=2, sigma=1.0, precond="jacobi")
    with _pytest.raises(NotImplementedError):
        scipy_compat.eigsh(A, k=2, which="SA", precond="ilu0")
