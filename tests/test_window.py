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


def test_spoke_windowed_f32_contract():
    """End-to-end regression for the production unstructured wiring:
    spoke mesh, f32, window FORCED on, CG + SA-AMG + deflation +
    mixed-precision refinement must close the 1e-8 contract.

    Pins two r5 fixes: (a) the windowed V-cycle uses ASSEMBLED
    transfers — the factored runtime form is adjoint only to f32
    rounding and diverges outright on this mesh's wildly-scaled
    entries (rel 3.8 after 100 its vs 8e-7 with assembled transfers
    over the SAME hierarchy at 150k); (b) the bf16 fine-level twin is
    off by default — it stalls CG at ~2e-2, above the 1e-3
    refinement-engagement threshold."""
    from tpufem.config import Config, SolverOptions
    from tpufem.mesh.spoke import create_spoke_mesh
    from tpufem.problems import poisson

    cfg = Config(problem_type="poisson", ndofs=20_000,
                 scaling_type="weak", mesh_type="unstructured",
                 dtype="float32",
                 solver=SolverOptions(pc_type="amg", ksp_rtol=1e-8,
                                      ksp_max_it=100,
                                      amg_fine_window="on"))
    mesh = create_spoke_mesh(20_000, True, 1, 1, verbose=False)
    prob = poisson.problem(mesh, 1, cfg)
    assert getattr(prob.solver_function, "_window_info", None) is None
    x, it = prob.solver_function(prob.u, prob.b)
    assert prob.solver_function._window_info is not None
    tr = prob.solver_function._last_true_rel
    assert tr is not None and tr <= 1e-7, (tr, it)


def test_window_rectangular_matvec():
    """Rectangular windowed form (the AMG transfer matvecs): exact for
    both tall (P, [n x nc]) and wide (PT, [nc x n]) shapes."""
    rng = np.random.default_rng(7)
    n, nc_ = 700, 53
    P = sp.random(n, nc_, density=0.02, random_state=3, format="csr")
    P.data[:] = rng.standard_normal(P.nnz)
    for M in (P, P.T.tocsr()):
        w = WindowedMatrix.from_csr(M.indptr, M.indices, M.data,
                                    dtype=np.float64, ncols=M.shape[1])
        x = rng.standard_normal(M.shape[1])
        y = np.asarray(w.matvec(jnp.asarray(x)))
        ref = M @ x
        assert y.shape == (M.shape[0],)
        assert np.allclose(y, ref, atol=1e-12 * max(1.0, np.abs(ref).max()))
