"""Pallas fused-stencil kernel vs the XLA DIA apply (interpret mode on
CPU; the same comparison runs bit-exact on real TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufem.fem.dia_op import DiaOperator
from tpufem.fem.pallas_stencil import auto_tz, dia_apply_pallas
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.mesh import BoxTetMesh
from tpufem.problems import common


@pytest.mark.parametrize("dims,tz", [((6, 5, 9), 4), ((5, 7, 6), 16),
                                     ((4, 4, 8), 0),
                                     # >= 6 cubes/axis: const-mode operator
                                     # -> scalar-weight kernel + corrections
                                     ((8, 6, 10), 0), ((6, 6, 6), 4)])
def test_pallas_stencil_matches_dia(dims, tz):
    mesh = BoxTetMesh(*dims)
    space = FunctionSpace(mesh, 1)
    facets = mesh.locate_boundary_facets(common.poisson_bc_marker)
    bc = DirichletBC.from_space(space, facets)
    op = DiaOperator.build(mesh, 1, "poisson", bc_dofs=bc.flat_dofs(),
                           dtype=jnp.float64, bake_bc=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.layout.ndofs))
    y_ref = np.asarray(op.apply(x))
    y_pl = np.asarray(dia_apply_pallas(op, x, interpret=True, tz=tz))
    assert np.allclose(y_pl, y_ref, atol=1e-12)


def test_auto_tz_sane():
    assert 1 <= auto_tz(7, 128, 128) <= 64
    assert auto_tz(15, 1000, 1000) >= 1
