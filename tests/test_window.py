"""Block-windowed SpMV (fem.window_op): exactness vs scipy, overflow
tail, RCM round-trip, and the full windowed CG+AMG solve combination the
unstructured path routes through (problems.poisson.make_solver)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from tpufem.fem.window_op import WindowedMatrix, rcm_csr


def _laplacian_3d(nx, ny, nz, dtype=np.float64):
    """27-point SPD operator on an nx*ny*nz grid — an unstructured-shaped
    CSR stress case (variable row widths at the boundary)."""
    def idx(i, j, k):
        return (i * ny + j) * nz + k
    rows, cols, vals = [], [], []
    rng = np.random.default_rng(7)
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                r = idx(i, j, k)
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        for dk in (-1, 0, 1):
                            ii, jj, kk = i + di, j + dj, k + dk
                            if 0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz:
                                c = idx(ii, jj, kk)
                                if c == r:
                                    continue
                                rows.append(r)
                                cols.append(c)
                                vals.append(-1.0)
    M = sp.csr_matrix((vals, (rows, cols)), shape=(nx * ny * nz,) * 2)
    M = (M + M.T) * 0.5
    d = -np.asarray(M.sum(axis=1)).ravel() + 1.0 + rng.random(M.shape[0])
    M = (M + sp.diags(d)).tocsr()
    M.sort_indices()
    return M.astype(dtype)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 5e-6), (np.float64, 1e-13)])
def test_window_matvec_parity(dtype, tol):
    M = _laplacian_3d(9, 8, 7, dtype)
    n = M.shape[0]
    x = np.random.default_rng(0).standard_normal(n).astype(dtype)
    y_ref = M @ x
    w = WindowedMatrix.from_csr(M.indptr, M.indices, M.data, dtype=dtype,
                                R=16, C=128)
    assert w is not None
    y = np.asarray(w.matvec(jnp.asarray(x)))
    assert np.max(np.abs(y - y_ref)) <= tol * np.abs(y_ref).max()


def test_window_overflow_tail_exact():
    """w_cap=1 pushes most entries into the COO overflow — still exact."""
    M = _laplacian_3d(7, 6, 5)
    n = M.shape[0]
    x = np.random.default_rng(1).standard_normal(n)
    w = WindowedMatrix.from_csr(M.indptr, M.indices, M.data,
                                dtype=np.float64, R=8, C=32, w_cap=1)
    assert w.ov_rows is not None and w.ov_rows.shape[0] > 0
    y = np.asarray(w.matvec(jnp.asarray(x)))
    assert np.allclose(y, M @ x, rtol=0, atol=1e-12 * np.abs(M @ x).max())


def test_window_budget_gate():
    M = _laplacian_3d(6, 6, 6)
    w = WindowedMatrix.from_csr(M.indptr, M.indices, M.data,
                                dtype=np.float64, budget_bytes=16)
    assert w is None


def test_window_rcm_roundtrip():
    M = _laplacian_3d(8, 7, 6)
    n = M.shape[0]
    perm, csr_w = rcm_csr(M.indptr, M.indices, M.data)
    w = WindowedMatrix.from_csr(*csr_w, dtype=np.float64, perm=perm)
    x = np.random.default_rng(2).standard_normal(n)
    # matvec in permuted space + map back == original product
    y_p = np.asarray(w.matvec(jnp.asarray(x)[w.perm]))
    y = y_p[np.asarray(w.iperm)]
    assert np.allclose(y, M @ x, atol=1e-12 * np.abs(M @ x).max())
    # perm/iperm are mutually inverse
    assert np.array_equal(np.asarray(w.perm)[np.asarray(w.iperm)],
                          np.arange(n))


def test_windowed_cg_amg_solve():
    """The combination the unstructured path runs: RCM + windowed fine
    operator as CG apply AND V-cycle fine level over a factored SA-AMG
    hierarchy built from the permuted CSR."""
    from tpufem.config import SolverOptions
    from tpufem.la.amg import SAAMG
    from tpufem.la.cg import cg_solve

    M = _laplacian_3d(12, 11, 10)
    n = M.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    perm, csr_w = rcm_csr(M.indptr, M.indices, M.data)
    w = WindowedMatrix.from_csr(*csr_w, dtype=np.float64, perm=perm)
    amg = SAAMG.setup(csr_w, bs=1, options=SolverOptions(),
                      dtype=jnp.float64, fine_factored=True)
    x_p, it, rel = cg_solve(
        w.matvec, jnp.asarray(b)[w.perm],
        precond=lambda r: amg.vcycle(r, fine_matvec=w.matvec),
        rtol=1e-10, maxit=60)
    assert rel < 1e-10 and int(it) < 40
    x = np.asarray(x_p)[np.asarray(w.iperm)]
    x_ref = sp.linalg.spsolve(M.tocsc(), b)
    assert np.max(np.abs(x - x_ref)) <= 1e-8 * np.abs(x_ref).max()


def test_plan_windows_native_matches_numpy(monkeypatch):
    """The native per-row-block planner (fastsetup plan_windows_c) must
    reproduce the numpy argsort+unique plan exactly — same W choice,
    same per-nonzero window coordinates."""
    from tpufem import native
    from tpufem.fem import window_op

    if not native.have_native():
        pytest.skip("native unavailable")
    M = _laplacian_3d(11, 9, 8)
    nat = window_op._plan_windows(M.indptr, M.indices, 16, 128, 4)
    monkeypatch.setattr(native, "plan_windows", lambda *a, **k: None)
    ref = window_op._plan_windows(M.indptr, M.indices, 16, 128, 4)
    for got, want in zip(nat, ref):
        if np.isscalar(want):
            assert got == want
        else:
            assert np.array_equal(got, want)


def test_csr_permute_sym_native_matches_scipy(monkeypatch):
    """Native symmetric CSR permutation (rcm_csr's hot path) must equal
    scipy's fancy-indexed M[perm][:, perm] bit-for-bit."""
    from tpufem import native
    from tpufem.fem import window_op

    if not native.have_native():
        pytest.skip("native unavailable")
    M = _laplacian_3d(10, 7, 6)
    perm_a, csr_a = rcm_csr(M.indptr, M.indices, M.data)
    monkeypatch.setattr(native, "csr_permute_sym", lambda *a, **k: None)
    perm_b, csr_b = rcm_csr(M.indptr, M.indices, M.data)
    assert np.array_equal(perm_a, perm_b)
    assert np.array_equal(csr_a[0], csr_b[0])
    assert np.array_equal(csr_a[1], csr_b[1])
    assert np.array_equal(csr_a[2], csr_b[2])
