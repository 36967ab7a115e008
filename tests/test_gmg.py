"""Geometric multigrid tests (the cube-path preconditioner)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from tpufem.config import Config, SolverOptions
from tpufem.la.gmg import GMG, prolong_h, restrict_h
from tpufem.mesh import BoxTetMesh
from tpufem.mesh.structured import compute_box_size_structured, num_pdofs
from tpufem.problems import common, elasticity, poisson


def test_h_transfer_adjoint():
    rng = np.random.default_rng(0)
    cd = (3, 2, 4)  # coarse dims (Nx, Ny, Nz)
    fd = (6, 4, 8)
    c = jnp.asarray(rng.standard_normal((cd[2] + 1, cd[1] + 1, cd[0] + 1, 1)))
    f = jnp.asarray(rng.standard_normal((fd[2] + 1, fd[1] + 1, fd[0] + 1, 1)))
    Pc = prolong_h(c, fd)
    Rf = restrict_h(f, cd)
    # <P c, f> == <c, R f>
    lhs = float(jnp.sum(Pc * f))
    rhs = float(jnp.sum(c * Rf))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_prolong_h_reproduces_linear_fields():
    """Linear functions must interpolate exactly (P1 nested spaces)."""
    cd = (2, 2, 2)
    fd = (4, 4, 4)
    zz, yy, xx = np.meshgrid(np.arange(cd[2] + 1) / cd[2],
                             np.arange(cd[1] + 1) / cd[1],
                             np.arange(cd[0] + 1) / cd[0], indexing="ij")
    lin = 1.0 + 2 * xx + 3 * yy - zz
    f = prolong_h(jnp.asarray(lin[..., None]), fd)
    zz, yy, xx = np.meshgrid(np.arange(fd[2] + 1) / fd[2],
                             np.arange(fd[1] + 1) / fd[1],
                             np.arange(fd[0] + 1) / fd[0], indexing="ij")
    expect = 1.0 + 2 * xx + 3 * yy - zz
    assert np.allclose(np.asarray(f)[..., 0], expect, atol=1e-14)


def test_size_structured():
    nx, ny, nz, lv = compute_box_size_structured(500000, True, 1, 1, 1, 4)
    assert nx % 16 == 0 and ny % 16 == 0 and nz % 16 == 0
    got = num_pdofs(nx, ny, nz, 0, 1)
    assert abs(got - 500000) / 500000 < 0.12


def _solve(problem_mod, mesh, order, problem_name, maxit=60):
    cfg = Config(problem_type=problem_name, dtype="float64",
                 solver=SolverOptions(pc_type="gmg", ksp_rtol=1e-8,
                                      ksp_max_it=maxit))
    prob = problem_mod.problem(mesh, order, cfg)
    x, it = prob.solver_function(prob.u, prob.b)
    return prob, np.asarray(x), it


@pytest.mark.parametrize("order,maxiter", [(1, 30), (2, 40), (3, 60)])
def test_gmg_poisson_converges_fast(order, maxiter):
    mesh = BoxTetMesh(16, 16, 16)
    prob, x, it = _solve(poisson, mesh, order, "poisson", maxiter)
    assert it < maxiter
    # true residual check against the structured operator in f64
    from tpufem.fem.structured_op import StructuredOperator
    op = StructuredOperator.build(mesh, order, "poisson",
                                  bc_dofs=prob.bc.flat_dofs(),
                                  dtype=jnp.float64)
    r = np.asarray(prob.b) - np.asarray(op.apply(jnp.asarray(x)))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(prob.b)) < 1e-7


def test_gmg_elasticity_converges():
    mesh = BoxTetMesh(8, 8, 8)
    prob, x, it = _solve(elasticity, mesh, 1, "elasticity", 60)
    assert it < 60
    from tpufem.fem.structured_op import StructuredOperator
    op = StructuredOperator.build(mesh, 1, "elasticity",
                                  bc_dofs=prob.bc.flat_dofs(),
                                  dtype=jnp.float64)
    r = np.asarray(prob.b) - np.asarray(op.apply(jnp.asarray(x)))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(prob.b)) < 1e-7


def test_gmg_mesh_independent_iterations():
    """Multigrid signature: iteration counts stay ~flat as h decreases."""
    its = []
    for n in (16, 32):
        mesh = BoxTetMesh(n, n, n)
        _, _, it = _solve(poisson, mesh, 1, "poisson", 60)
        its.append(it)
    # counts stay O(10) and grow at most mildly with refinement
    assert its[-1] <= its[0] + 6
    assert max(its) < 20
