"""Native (C++) host-setup accelerators vs their numpy/scipy twins.

The native module backs the hottest host passes (sort/unique over
entity keys, COO->CSR, AMG aggregation); each binding must agree with
the pure-Python fallback it replaces (reference analogue: DOLFINx's
C++ topology/sparsity kernels, src/mesh.cpp, validated against its
Python layer).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from tpufem import native


pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native toolchain unavailable")


def test_argsort_u64_matches_numpy():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, size=10_000, dtype=np.int64)
    keys[::17] = keys[0]  # duplicates: stability matters
    perm = native.argsort_u64(keys)
    ref = np.argsort(keys.view(np.uint64), kind="stable")
    assert np.array_equal(perm, ref)


def test_unique_inverse_u64_matches_numpy():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1000, size=5000, dtype=np.int64)
    uniq, inv = native.unique_inverse_u64(keys)
    ru, rinv = np.unique(keys, return_inverse=True)
    assert np.array_equal(uniq, ru)
    assert np.array_equal(inv, rinv)


def test_coo_to_csr_dedup_matches_scipy():
    rng = np.random.default_rng(2)
    n, nnz = 200, 5000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    # force exact-zero sums (eliminate_zeros must drop them)
    rows[10], cols[10], vals[10] = 5, 7, 1.5
    rows[11], cols[11], vals[11] = 5, 7, -1.5
    indptr, ucols, uvals = native.coo_to_csr_dedup(rows, cols, vals, n)
    A = sp.csr_matrix((uvals, ucols, indptr), shape=(n, n))
    R = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    R.sum_duplicates()
    R.eliminate_zeros()
    # identical pattern; values agree to rounding (duplicate summation
    # order differs between the native sweep and scipy)
    assert np.array_equal(A.indptr, R.indptr)
    assert np.array_equal(A.indices, R.indices)
    assert np.allclose(A.data, R.data, rtol=0, atol=1e-12)
    assert A[5, 7] == 0.0 and 7 not in A.indices[A.indptr[5]:A.indptr[6]]


def _laplace_strength(n1d: int):
    """1D Laplacian off-diagonal pattern as a strength graph."""
    n = n1d
    main = np.zeros(n)
    off = np.ones(n - 1)
    A = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    A.eliminate_zeros()
    return A


def test_aggregate_vmb_covers_all_nodes():
    S = _laplace_strength(101)
    n = S.shape[0]
    order = np.random.default_rng(3).permutation(n)
    agg, nagg = native.aggregate_vmb(S.indptr, S.indices, S.data, order)
    assert agg.shape == (n,)
    assert agg.min() >= 0 and agg.max() == nagg - 1
    # every aggregate id in [0, nagg) is used
    assert np.unique(agg).size == nagg
    # path-graph aggregates are intervals of size <= 5 (root + 2
    # phase-1 neighbors + one phase-2 joiner at each end)
    for a in range(nagg):
        members = np.flatnonzero(agg == a)
        assert members.size <= 5
        assert members.max() - members.min() == members.size - 1


def test_aggregate_vmb_deterministic_and_connected():
    rng = np.random.default_rng(4)
    n = 500
    G = sp.random(n, n, density=0.02, random_state=5, format="coo")
    S = ((G + G.T).tocsr())
    S.setdiag(0.0)
    S.eliminate_zeros()
    S.data[:] = np.abs(S.data)
    order = rng.permutation(n)
    a1, n1 = native.aggregate_vmb(S.indptr, S.indices, S.data, order)
    a2, n2 = native.aggregate_vmb(S.indptr, S.indices, S.data, order)
    assert n1 == n2 and np.array_equal(a1, a2)
    # each non-singleton aggregate is connected through its members:
    # every member has a strength edge to another member (VMB invariant)
    for a in range(n1):
        members = np.flatnonzero(a1 == a)
        if members.size == 1:
            continue
        mset = set(members.tolist())
        for i in members:
            nbrs = S.indices[S.indptr[i]:S.indptr[i + 1]]
            assert mset.intersection(nbrs.tolist()), \
                f"member {i} of aggregate {a} disconnected"


def test_refine_marked_edges_cpp_matches_numpy():
    """The C++ Plaza bisection and the vectorized numpy fallback must
    produce BIT-IDENTICAL meshes (same closure fixed point, same cell
    ordering, same midpoint numbering)."""
    from tpufem.mesh.structured import BoxTetMesh
    from tpufem.mesh.topology import TetTopology
    import tpufem.mesh.refine as R

    box = BoxTetMesh(2, 2, 2)
    verts = box.vertex_coords(np.arange(box.num_vertices_global))
    cells = box.cells()
    topo = TetTopology(verts, cells)
    ev = topo.edge_vertices(np.arange(0, topo.num_edges_global, 5))
    gv, gc = native.refine_marked_edges(verts, cells, ev)
    orig = native.refine_marked_edges
    native.refine_marked_edges = lambda *a, **k: None  # force numpy
    try:
        nv, nc = R.refine_marked_edges(verts, cells, ev)
    finally:
        native.refine_marked_edges = orig
    assert np.array_equal(gv, nv)
    assert np.array_equal(gc, nc)


def test_refine_marked_edges_stale_marks():
    """Marked edges absent from the mesh (e.g. already split upstream)
    are ignored, not crashed on."""
    from tpufem.mesh.structured import BoxTetMesh
    box = BoxTetMesh(1, 1, 1)
    verts = box.vertex_coords(np.arange(box.num_vertices_global))
    cells = box.cells()
    # pick a vertex pair that is NOT an edge of any cell
    from tpufem.mesh.structured import LOCAL_EDGES
    keys = set(map(tuple, np.sort(
        cells[:, LOCAL_EDGES].reshape(-1, 2), axis=1).tolist()))
    pair = None
    nvg = verts.shape[0]
    for a in range(nvg):
        for b in range(a + 1, nvg):
            if (a, b) not in keys:
                pair = (a, b)
                break
        if pair:
            break
    assert pair is not None
    gv, gc = native.refine_marked_edges(verts, cells,
                                        np.array([pair]))
    assert np.array_equal(gv, verts) and np.array_equal(gc, cells)


def test_aggregate_vmb_isolated_nodes():
    """Nodes with no strength edges become singleton aggregates."""
    n = 10
    S = sp.csr_matrix((n, n))
    agg, nagg = native.aggregate_vmb(S.indptr, S.indices, S.data,
                                     np.arange(n))
    assert nagg == n and np.unique(agg).size == n


def test_coo_to_csr_dedup_all_zero():
    rows = np.array([1, 1, 2])
    cols = np.array([2, 2, 3])
    vals = np.array([1.0, -1.0, 0.0])
    indptr, ucols, uvals = native.coo_to_csr_dedup(rows, cols, vals, 5)
    assert uvals.size == 0 and indptr[-1] == 0


def test_tet_edges_matches_numpy():
    from tpufem.mesh.structured import LOCAL_EDGES
    from tpufem.native import tet_edges
    rng = np.random.default_rng(7)
    nv = 400
    cells = rng.integers(0, nv, size=(1500, 4))
    got = tet_edges(cells, nv)
    if got is None:
        pytest.skip("native unavailable")
    ev, ce, fl = got
    pairs = cells[:, LOCAL_EDGES]
    lo = pairs.min(axis=-1)
    hi = pairs.max(axis=-1)
    key = lo.astype(np.int64) * nv + hi
    uniq, inv = np.unique(key.ravel(), return_inverse=True)
    np.testing.assert_array_equal(
        ev, np.stack([uniq // nv, uniq % nv], axis=-1))
    np.testing.assert_array_equal(ce, inv.reshape(-1, 6))
    np.testing.assert_array_equal(fl, pairs[..., 0] > pairs[..., 1])
