"""End-to-end problem tests on small meshes: framework solve vs scipy
sparse direct solve of the identical system (golden-value strategy
replacing the reference's eyeball iteration-count/norm checks)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.config import Config, SolverOptions
from tpufem.mesh import BoxTetMesh
from tpufem.problems import cgpoisson, elasticity, poisson


def _csr_scipy(csr_tuple, bs=1):
    indptr, indices, data = csr_tuple
    if bs == 1:
        return sp.csr_matrix((data, indices, indptr))
    n = (indptr.shape[0] - 1) * bs
    return sp.bsr_matrix((data, indices, indptr), shape=(n, n)).tocsr()


def cfg_for(problem_type, pc="jacobi", rtol=1e-10, maxit=5000):
    return Config(problem_type=problem_type, dtype="float64",
                  solver=SolverOptions(pc_type=pc, ksp_rtol=rtol,
                                       ksp_max_it=maxit))


@pytest.mark.parametrize("order", [1, 2, 3])
def test_poisson_solve_matches_direct(order):
    mesh = BoxTetMesh(3, 3, 3)
    cfg = cfg_for("poisson")
    prob = poisson.problem(mesh, order, cfg)
    x, it = prob.solver_function(prob.u, prob.b)
    assert 0 < it < 5000

    # re-assemble with scipy and solve directly
    from tpufem.fem.assemble import assemble_operator
    _, csr = assemble_operator(prob.space, prob.bc, "poisson",
                               dtype=np.float64)
    A = _csr_scipy(csr)
    x_ref = spla.spsolve(A.tocsc(), np.asarray(prob.b))
    assert np.allclose(np.asarray(x), x_ref, atol=1e-7)
    # BC dofs hold the BC value
    assert np.allclose(np.asarray(x)[prob.bc.flat_dofs()], 0.0)
    # solution should be nontrivial
    assert np.linalg.norm(np.asarray(x)) > 1e-3


@pytest.mark.parametrize("order", [1, 2])
def test_cgpoisson_matches_assembled(order):
    """Matrix-free path must reproduce the assembled-path solution
    (equality of the operator was unit-tested; this checks the full
    b/BC/solve plumbing, incl. the b[bc]=0 convention of
    cgpoisson_problem.cpp:168)."""
    mesh = BoxTetMesh(3, 3, 2)
    cfgm = cfg_for("cgpoisson")
    cfgm.solver.extra.update(cg_rtol=1e-12, cg_kmax=3000)
    probm = cgpoisson.problem(mesh, order, cfgm)
    xm, itm = probm.solver_function(probm.u, probm.b)

    cfga = cfg_for("poisson")
    proba = poisson.problem(mesh, order, cfga)
    xa, ita = proba.solver_function(proba.u, proba.b)

    # poisson path has x[bc] = bc value (=0), cgpoisson keeps bc dofs 0;
    # both zero here -> full vectors comparable
    assert np.allclose(np.asarray(xm), np.asarray(xa), atol=1e-6)
    assert 0 < itm <= 3000


def test_poisson_amg_structured_matches_direct():
    """Forced SA-AMG on the structured cube: exercises the
    DiaOperator.to_scipy -> SAAMG.setup path inside make_solver (the
    production poisson_amg bench configuration)."""
    mesh = BoxTetMesh(6, 6, 6)
    cfg = cfg_for("poisson", pc="amg", rtol=1e-10)
    prob = poisson.problem(mesh, 1, cfg)
    x, it = prob.solver_function(prob.u, prob.b)
    assert 0 < it < 200

    from tpufem.fem.assemble import assemble_operator
    _, csr = assemble_operator(prob.space, prob.bc, "poisson",
                               dtype=np.float64)
    A = _csr_scipy(csr)
    x_ref = spla.spsolve(A.tocsc(), np.asarray(prob.b))
    assert np.allclose(np.asarray(x), x_ref, atol=1e-7)


def test_elasticity_solve_matches_direct():
    mesh = BoxTetMesh(2, 2, 2)
    cfg = cfg_for("elasticity", maxit=20000)
    prob = elasticity.problem(mesh, 1, cfg)
    x, it = prob.solver_function(prob.u, prob.b)

    from tpufem.fem.assemble import assemble_operator
    _, csr = assemble_operator(prob.space, prob.bc, "elasticity",
                               dtype=np.float64)
    A = _csr_scipy(csr, bs=3)
    x_ref = spla.spsolve(A.tocsc(), np.asarray(prob.b))
    rel = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-6
    assert np.allclose(np.asarray(x)[prob.bc.flat_dofs()], 0.0)


def test_nullspace_orthonormal_and_in_kernel():
    """Rigid-body modes must be A-kernel vectors of the *unconstrained*
    elasticity operator (validates both the modes and the kernels)."""
    from tpufem.fem.assemble import assemble_operator
    from tpufem.fem.space import FunctionSpace
    from tpufem.la.nullspace import build_near_nullspace

    mesh = BoxTetMesh(2, 2, 1)
    space = FunctionSpace(mesh, 1, bs=3)
    ell, _ = assemble_operator(space, None, "elasticity", dtype=np.float64)
    nns = build_near_nullspace(space.scalar_dof_coords())
    assert nns.shape == (6, space.ndofs)
    G = nns @ nns.T
    assert np.allclose(G, np.eye(6), atol=1e-10)
    for k in range(6):
        r = np.asarray(ell.matvec(jnp.asarray(nns[k])))
        assert np.abs(r).max() < 1e-4  # entries are O(1e6); kernel to rtol


@pytest.mark.parametrize("problem_name,order", [("poisson", 1),
                                                ("poisson", 2),
                                                ("elasticity", 1)])
def test_device_rhs_matches_host(problem_name, order):
    """The float32 device-side RHS (jitted mass-stencil apply) equals the
    host f64 assembly to f32 rounding."""
    from tpufem.fem.dirichlet import DirichletBC
    from tpufem.fem.space import FunctionSpace
    from tpufem.problems import common as C
    from tpufem.problems.elasticity import (
        assemble_elasticity_rhs_np, assemble_elasticity_rhs_structured_dev)
    from tpufem.problems.poisson import (assemble_poisson_rhs_np,
                                         assemble_poisson_rhs_structured_dev)
    mesh = BoxTetMesh(8, 10, 12)
    if problem_name == "poisson":
        space = FunctionSpace(mesh, order)
        bc = DirichletBC.from_space(
            space, mesh.locate_boundary_facets(C.poisson_bc_marker))
        bh = assemble_poisson_rhs_np(space)
        bd = assemble_poisson_rhs_structured_dev(space, bc, jnp.float32)
    else:
        space = FunctionSpace(mesh, order, bs=3)
        bc = DirichletBC.from_space(
            space, mesh.locate_boundary_facets(C.elasticity_bc_marker))
        bh = assemble_elasticity_rhs_np(space)
        bd = assemble_elasticity_rhs_structured_dev(space, bc, jnp.float32)
    bh[bc.flat_dofs()] = bc.value
    rel = np.abs(np.asarray(bd) - bh).max() / np.abs(bh).max()
    assert rel < 1e-6


def test_structured_dev_rhs_matches_host():
    """The fused device RHS (on-device f evaluation + sparse facet
    term) equals the host f64 assembly to f32 rounding, P1 and P2."""
    import jax.numpy as jnp
    from tpufem.fem.dirichlet import DirichletBC
    from tpufem.fem.space import FunctionSpace
    from tpufem.mesh import BoxTetMesh
    from tpufem.problems.common import poisson_bc_marker
    from tpufem.problems.poisson import (assemble_poisson_rhs_np,
                                         assemble_poisson_rhs_structured_dev)
    for order in (1, 2):
        mesh = BoxTetMesh(8, 9, 10)
        space = FunctionSpace(mesh, order)
        bc = DirichletBC.from_space(
            space, mesh.locate_boundary_facets(poisson_bc_marker))
        b_ref = assemble_poisson_rhs_np(space)
        b_ref[bc.flat_dofs()] = bc.value
        b_dev = np.asarray(
            assemble_poisson_rhs_structured_dev(space, bc, jnp.float32))
        s = np.abs(b_ref).max()
        assert np.abs(b_dev - b_ref).max() < 5e-6 * s


def test_structured_dev_elasticity_rhs_matches_host():
    """The fused device elasticity RHS (on-device body force) equals the
    host f64 assembly to f32 rounding, P1 and P2."""
    import jax.numpy as jnp
    from tpufem.fem.dirichlet import DirichletBC
    from tpufem.fem.space import FunctionSpace
    from tpufem.mesh import BoxTetMesh
    from tpufem.problems.common import elasticity_bc_marker
    from tpufem.problems.elasticity import (
        assemble_elasticity_rhs_np, assemble_elasticity_rhs_structured_dev)
    for order in (1, 2):
        mesh = BoxTetMesh(8, 9, 10)
        space = FunctionSpace(mesh, order, bs=3)
        bc = DirichletBC.from_space(
            space, mesh.locate_boundary_facets(elasticity_bc_marker))
        b_ref = assemble_elasticity_rhs_np(space)
        b_ref[bc.flat_dofs()] = bc.value
        b_dev = np.asarray(
            assemble_elasticity_rhs_structured_dev(space, bc, jnp.float32))
        s = np.abs(b_ref).max()
        assert np.abs(b_dev - b_ref).max() < 5e-6 * s
