"""Native hostkit tests: C++ path vs the NumPy/SciPy fallbacks, and the
graph algorithms' invariants."""

import numpy as np
import pytest

from sprsolve_tpu import native
from sprsolve_tpu.utils import problems


@pytest.fixture(scope="module")
def lap():
    return problems.grid_laplacian_dirichlet((16, 16))


def test_native_builds():
    assert native.have_native(), "g++ toolchain expected in this environment"


def test_symmetrize_pattern(lap):
    n = lap.shape[0]
    indptr = np.asarray(lap.indptr, np.int64)
    indices = np.asarray(lap.indices, np.int32)
    sp_indptr, sp_indices = native.symmetrize_pattern(n, indptr, indices)
    import scipy.sparse as sps

    a = sps.csr_matrix((np.ones(len(indices)), indices, indptr), shape=(n, n))
    want = (a + a.T).tocsr()
    np.testing.assert_array_equal(sp_indptr, want.indptr)
    np.testing.assert_array_equal(np.sort(sp_indices), np.sort(want.indices))


def test_greedy_color_proper(lap):
    n = lap.shape[0]
    sp_indptr, sp_indices = native.symmetrize_pattern(
        n, np.asarray(lap.indptr, np.int64), np.asarray(lap.indices, np.int32)
    )
    colors = native.greedy_color(n, sp_indptr, sp_indices)
    for i in range(n):
        nbr = sp_indices[sp_indptr[i] : sp_indptr[i + 1]]
        nbr = nbr[nbr != i]
        assert not np.any(colors[nbr] == colors[i])


def test_rcm_reduces_bandwidth():
    # random sparse symmetric pattern: RCM should not increase bandwidth
    rng = np.random.default_rng(0)
    import scipy.sparse as sps

    n = 300
    a = sps.random(n, n, density=0.01, random_state=0)
    a = ((a + a.T) > 0).astype(np.int8).tocsr() + sps.eye(n, dtype=np.int8)
    a = a.tocsr()
    order = native.rcm_order(
        n, a.indptr.astype(np.int64), a.indices.astype(np.int32)
    )
    assert sorted(order.tolist()) == list(range(n))  # a permutation
    perm = np.empty(n, dtype=np.int64)
    perm[order] = np.arange(n)
    b = a[order][:, order].tocsr()
    bw_before = native.csr_bandwidth(
        n, a.indptr.astype(np.int64), a.indices.astype(np.int32)
    )
    bw_after = native.csr_bandwidth(
        n, b.indptr.astype(np.int64), b.indices.astype(np.int32)
    )
    assert bw_after <= bw_before


def test_coo_sort_perm_matches_lexsort():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 50, 500).astype(np.int32)
    cols = rng.integers(0, 50, 500).astype(np.int32)
    perm = native.coo_sort_perm(50, rows, cols)
    want = np.lexsort((cols, rows))
    # permutations may differ on duplicate keys; compare sorted keys
    np.testing.assert_array_equal(rows[perm], rows[want])
    np.testing.assert_array_equal(cols[perm], cols[want])


def test_bandwidth_and_diag_count(lap):
    n = lap.shape[0]
    indptr = np.asarray(lap.indptr, np.int64)
    indices = np.asarray(lap.indices, np.int32)
    assert native.csr_bandwidth(n, indptr, indices) == 16  # grid stride
    assert native.csr_count_diagonals(n, indptr, indices) == 5
