"""Lattice-brick SA-AMG (la/bramg.py) correctness.

The probed-Galerkin construction silently corrupts entries if any
assumption breaks (stencil reach > 1 would alias probe columns), so the
core test pins probe-vs-explicit equality of the level-1 operator
against a scipy-built P^T A P.  Convergence tests mirror the reference's
solver contract (CG rtol 1e-8; GAMG analogue, README.md:63-128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpufem.config import Config, SolverOptions
from tpufem.fem.dia_op import build_operator
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.la.bramg import BrickAMG, brick_viable
from tpufem.la.cg import cg_solve
from tpufem.mesh import BoxTetMesh
from tpufem.problems import common


def _explicit_tentative(pc, n):
    """Host CSR of the tentative prolongator from the level-0 fw field."""
    lv0 = pc.levels[0]
    gz, gy, gx = lv0.gdims
    az, ay, ax = lv0.adims
    fw = np.asarray(lv0.fw)  # [gz, gy, gx, c, m]
    c, m = fw.shape[3], fw.shape[4]
    z, y, x = np.meshgrid(np.arange(gz), np.arange(gy), np.arange(gx),
                          indexing="ij")
    agg = ((z // 3) * ay + y // 3) * ax + x // 3
    node = (z * gy + y) * gx + x
    rows = (node[..., None, None] * c
            + np.arange(c)[:, None]) * np.ones(m, dtype=np.int64)
    cols = agg[..., None, None] * m + np.arange(m)[None, :]
    cols = np.broadcast_to(cols, fw.shape)
    rows = np.broadcast_to(rows, fw.shape)
    return sp.coo_matrix((fw.ravel(), (rows.ravel(), cols.ravel())),
                         shape=(n, az * ay * ax * m)).tocsr()


def test_probed_galerkin_matches_explicit():
    """Level-1 stencil from coloring probes == scipy P^T A P exactly."""
    mesh = BoxTetMesh(7, 8, 9)
    space = FunctionSpace(mesh, 1)
    bc = DirichletBC.from_space(
        space, mesh.locate_boundary_facets(common.poisson_bc_marker))
    A = build_operator(mesh, 1, "poisson", bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64)
    opts = SolverOptions(pc_type="amg", amg_coarse_eq_limit=4)
    pc = BrickAMG.setup(A, mesh, 1, opts, dtype=jnp.float64,
                        bc_mask=bc.mask())
    assert len(pc.levels) >= 2  # a real stencil level exists

    M = A.to_scipy()
    n = M.shape[0]
    P0 = _explicit_tentative(pc, n)
    odinv = np.asarray(pc.levels[0].omega_dinv)
    P = P0 - sp.diags(odinv) @ (M @ P0)
    Ac_ref = (P.T @ M @ P).toarray()

    lv1 = pc.levels[1]
    nc = pc.level_sizes[1]
    Ac = np.zeros((nc, nc))
    for k in range(nc):
        e = np.zeros(nc)
        e[k] = 1.0
        Ac[:, k] = np.asarray(lv1.matvec(jnp.asarray(e)))
    scale = np.abs(Ac_ref).max()
    assert np.abs(Ac - Ac_ref).max() < 1e-12 * scale


def test_tentative_adjoint():
    """<P0 xc, v> == <xc, P0^T v> (transfer pair is a true adjoint)."""
    mesh = BoxTetMesh(6, 7, 5)
    space = FunctionSpace(mesh, 1)
    bc = DirichletBC.from_space(
        space, mesh.locate_boundary_facets(common.poisson_bc_marker))
    A = build_operator(mesh, 1, "poisson", bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64)
    pc = BrickAMG.setup(A, mesh, 1, SolverOptions(amg_coarse_eq_limit=4),
                        dtype=jnp.float64, bc_mask=bc.mask())
    lv0 = pc.levels[0]
    rng = np.random.default_rng(0)
    n, nc = pc.level_sizes[0], pc.level_sizes[1]
    v = jnp.asarray(rng.standard_normal(n))
    xc = jnp.asarray(rng.standard_normal(nc))
    lhs = float(jnp.dot(lv0.p0_apply(xc), v))
    rhs = float(jnp.dot(xc, lv0.p0t_apply(v)))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)


def test_vcycle_symmetric():
    """The V(1,1) cycle is a symmetric operator (PCG requirement)."""
    mesh = BoxTetMesh(7, 6, 8)
    space = FunctionSpace(mesh, 1)
    bc = DirichletBC.from_space(
        space, mesh.locate_boundary_facets(common.poisson_bc_marker))
    A = build_operator(mesh, 1, "poisson", bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64)
    pc = BrickAMG.setup(A, mesh, 1, SolverOptions(amg_coarse_eq_limit=30),
                        dtype=jnp.float64, bc_mask=bc.mask())
    rng = np.random.default_rng(1)
    n = pc.level_sizes[0]
    u = jnp.asarray(rng.standard_normal(n))
    v = jnp.asarray(rng.standard_normal(n))
    Mu = pc.vcycle(u, fine_matvec=A.apply)
    Mv = pc.vcycle(v, fine_matvec=A.apply)
    a, b = float(jnp.dot(Mu, v)), float(jnp.dot(u, Mv))
    assert abs(a - b) < 1e-9 * max(abs(a), 1.0)


def test_poisson_convergence_f64():
    mesh = BoxTetMesh(14, 15, 16)
    space = FunctionSpace(mesh, 1)
    bc = DirichletBC.from_space(
        space, mesh.locate_boundary_facets(common.poisson_bc_marker))
    A = build_operator(mesh, 1, "poisson", bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64)
    pc = BrickAMG.setup(A, mesh, 1, SolverOptions(amg_coarse_eq_limit=100),
                        dtype=jnp.float64, bc_mask=bc.mask())
    rng = np.random.default_rng(0)
    n = space.ndofs
    b = rng.standard_normal(n)
    b[np.asarray(bc.flat_dofs())] = 0.0
    x, it, rel = cg_solve(A.apply, jnp.asarray(b),
                          precond=pc.as_preconditioner(A.apply),
                          rtol=1e-8, maxit=100)
    r = b - np.asarray(A.apply(x))
    assert float(rel) <= 1e-8
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(it) <= 20


def test_elasticity_planar_convergence():
    """bs=3 planar fine layout + rigid-body nullspace; exercises
    rank-deficient edge bricks (1-node bricks have rank <= 3 < m = 6)."""
    from tpufem.la.nullspace import build_near_nullspace
    mesh = BoxTetMesh(10, 9, 11)
    space = FunctionSpace(mesh, 1, bs=3)
    bc = DirichletBC.from_space(
        space, mesh.locate_boundary_facets(common.elasticity_bc_marker))
    nns = build_near_nullspace(space.scalar_dof_coords())
    A = build_operator(mesh, 1, "elasticity", bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64, planar=True)
    pc = BrickAMG.setup(A, mesh, 3, SolverOptions(amg_coarse_eq_limit=30),
                        dtype=jnp.float64, near_nullspace=nns,
                        bc_mask=bc.mask())
    rng = np.random.default_rng(0)
    n = space.ndofs
    b = rng.standard_normal(n)
    b[np.asarray(bc.flat_dofs())] = 0.0
    b_p = np.ascontiguousarray(b.reshape(-1, 3).T).reshape(-1)
    x, it, rel = cg_solve(A.apply, jnp.asarray(b_p),
                          precond=pc.as_preconditioner(A.apply),
                          rtol=1e-8, maxit=200)
    r = b_p - np.asarray(A.apply(x))
    assert float(rel) <= 1e-8
    assert np.linalg.norm(r) / np.linalg.norm(b_p) < 1e-7
    assert int(it) <= 30


def test_problem_level_brick_amg_f32():
    """pc_type=amg on the structured path routes to BrickAMG and the
    f64 certification contract holds (true_rel <= 10 * rtol)."""
    from tpufem.problems import elasticity, poisson
    mesh = BoxTetMesh(14, 15, 16)
    cfg = Config(problem_type="poisson", ndofs=5000, scaling_type="strong",
                 dtype="float32",
                 solver=SolverOptions(pc_type="amg", ksp_rtol=1e-8,
                                      ksp_max_it=100,
                                      amg_coarse_eq_limit=100))
    prob = poisson.problem(mesh, 1, cfg)
    x, it = prob.solver_function(prob.u, prob.b)
    assert prob.solver_function._last_true_rel <= 1e-7
    assert it <= 20

    cfg2 = Config(problem_type="elasticity", ndofs=5000,
                  scaling_type="strong", dtype="float32",
                  solver=SolverOptions(pc_type="amg", ksp_rtol=1e-8,
                                       ksp_max_it=200,
                                       amg_coarse_eq_limit=100))
    prob2 = elasticity.problem(mesh, 1, cfg2)
    x2, it2 = prob2.solver_function(prob2.u, prob2.b)
    assert prob2.solver_function._last_true_rel <= 1e-7
    assert it2 <= 30


def test_brick_viable_gate():
    opts = SolverOptions()
    assert brick_viable(BoxTetMesh(4, 4, 4), 1, opts)
    assert not brick_viable(BoxTetMesh(4, 4, 4), 2, opts)
    opts_off = SolverOptions(amg_brick="off")
    assert not brick_viable(BoxTetMesh(4, 4, 4), 1, opts_off)
