"""DIA stencil operator vs assembled operator (with and without BC)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from tpufem.fem.assemble import assemble_operator
from tpufem.fem.dia_op import DiaOperator
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.mesh import BoxTetMesh
from tpufem.problems import common


@pytest.mark.parametrize("order,dims,problem,bs", [
    (1, (3, 4, 5), "poisson", 1),
    (2, (3, 2, 4), "poisson", 1),
    (3, (2, 3, 2), "poisson", 1),
    (1, (2, 3, 2), "elasticity", 3),
    (2, (2, 2, 2), "elasticity", 3),
])
def test_dia_matches_assembled(order, dims, problem, bs):
    mesh = BoxTetMesh(*dims)
    space = FunctionSpace(mesh, order, bs=bs)
    marker = (common.poisson_bc_marker if problem == "poisson"
              else common.elasticity_bc_marker)
    facets = mesh.locate_boundary_facets(marker)
    bc = DirichletBC.from_space(space, facets)
    ell, _ = assemble_operator(space, bc, problem, dtype=np.float64)
    op = DiaOperator.build(mesh, order, problem, bc_dofs=bc.flat_dofs(),
                           dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(space.ndofs))
    tol = 1e-11 if problem == "poisson" else 1e-6
    assert np.allclose(np.asarray(op.apply(x)),
                       np.asarray(ell.matvec(x)), atol=tol)
    assert np.allclose(op.apply_np(np.asarray(x)),
                       np.asarray(ell.matvec(x)), atol=tol)
    assert np.allclose(op.diagonal_np(), np.asarray(ell.diagonal()), atol=tol)


def test_dia_triple_count_p1():
    """P1 Poisson on the Kuhn lattice has at most 15 stencil points; on
    the isotropic unit cube the diagonal couplings cancel exactly and the
    classic 7-point stencil remains (all-zero diagonals are dropped)."""
    op = DiaOperator.build(BoxTetMesh(4, 4, 4), 1, "poisson",
                           dtype=jnp.float64)
    assert len(op.plan) == 7
    op2 = DiaOperator.build(BoxTetMesh(4, 5, 6), 1, "poisson",
                            dtype=jnp.float64)
    assert 7 <= len(op2.plan) <= 15
