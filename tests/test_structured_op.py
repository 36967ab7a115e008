"""Structured (stencil) operator vs the generic assembled operator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from tpufem.fem.assemble import assemble_operator
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.fem.structured_op import StructuredOperator, grid_layout
from tpufem.mesh import BoxTetMesh
from tpufem.problems import common


@pytest.mark.parametrize("order,dims", [(1, (3, 4, 5)), (2, (3, 2, 4)),
                                        (3, (2, 3, 2))])
def test_poisson_structured_matches_assembled(order, dims):
    mesh = BoxTetMesh(*dims)
    space = FunctionSpace(mesh, order)
    assert grid_layout(mesh, order).ndofs == space.ndofs_scalar
    ell, _ = assemble_operator(space, None, "poisson", dtype=np.float64)
    op = StructuredOperator.build(mesh, order, "poisson", dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(space.ndofs_scalar))
    y1 = np.asarray(op.apply_raw(x))
    y2 = np.asarray(ell.matvec(x))
    assert np.allclose(y1, y2, atol=1e-11)
    # diagonal
    d1 = np.asarray(op.diagonal())
    d2 = np.asarray(ell.diagonal())
    assert np.allclose(d1, d2, atol=1e-11)


@pytest.mark.parametrize("order", [1, 2])
def test_elasticity_structured_matches_assembled(order):
    mesh = BoxTetMesh(2, 3, 2)
    space = FunctionSpace(mesh, order, bs=3)
    ell, _ = assemble_operator(space, None, "elasticity", dtype=np.float64)
    op = StructuredOperator.build(mesh, order, "elasticity",
                                  dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(space.ndofs))
    y1 = np.asarray(op.apply_raw(x))
    y2 = np.asarray(ell.matvec(x))
    assert np.allclose(y1, y2, atol=1e-6)
    assert np.allclose(np.asarray(op.diagonal()),
                       np.asarray(ell.diagonal()), atol=1e-6)


def test_bc_apply_matches_bc_assembled():
    mesh = BoxTetMesh(3, 3, 3)
    space = FunctionSpace(mesh, 1)
    facets = mesh.locate_boundary_facets(common.poisson_bc_marker)
    bc = DirichletBC.from_space(space, facets)
    ell, _ = assemble_operator(space, bc, "poisson", dtype=np.float64)
    op = StructuredOperator.build(mesh, 1, "poisson",
                                  bc_dofs=bc.flat_dofs(), dtype=jnp.float64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(space.ndofs_scalar))
    assert np.allclose(np.asarray(op.apply(x)),
                       np.asarray(ell.matvec(x)), atol=1e-12)
