"""XDMF/HDF5 output round-trip (reference: src/main.cpp:213-223).

Full-order fidelity: for order >= 2 the writer stores the verbatim dof
vector + dof coordinates + cell->dof connectivity; reading them back
must reproduce the exact finite-element function (here pinned by
interpolating a polynomial the space represents exactly)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from tpufem.fem.space import FunctionSpace
from tpufem.io import read_xdmf, write_xdmf
from tpufem.mesh.structured import BoxTetMesh


@pytest.mark.parametrize("order", [1, 2, 3])
def test_roundtrip_scalar(order, tmp_path):
    mesh = BoxTetMesh(3, 3, 3)
    space = FunctionSpace(mesh, order)
    f = lambda x: 1.0 + 2.0 * x[:, 0] - 0.5 * x[:, 1] + 0.25 * x[:, 2]
    u = space.interpolate(f)
    fn = str(tmp_path / "sol.xdmf")
    write_xdmf(fn, mesh, u, bs=1, space=space)

    got = read_xdmf(fn)
    # topology / geometry round-trip exactly
    np.testing.assert_array_equal(got["topology"], mesh.cells())
    nv = mesh.num_vertices_global
    np.testing.assert_allclose(
        got["geometry"], mesh.vertex_coords(np.arange(nv)), rtol=0, atol=0)
    assert got["order"] == order and got["bs"] == 1
    # vertex attribute = exact point values at vertices
    np.testing.assert_allclose(got["values"][:, 0], u[:nv], rtol=0, atol=0)
    if order >= 2:
        # full dof vector + coords + connectivity present and exact
        np.testing.assert_allclose(got["dofs"][:, 0], u, rtol=0, atol=0)
        np.testing.assert_allclose(got["dof_coords"],
                                   space.scalar_dof_coords())
        np.testing.assert_array_equal(got["cell_dofs"], space.cell_dofs)
        # the stored data evaluates the function: point evaluation at the
        # stored dof_coords reproduces the stored dofs for a linear f
        np.testing.assert_allclose(got["dofs"][:, 0], f(got["dof_coords"]),
                                   rtol=1e-12, atol=1e-12)
    else:
        assert "dofs" not in got


def test_roundtrip_vector(tmp_path):
    mesh = BoxTetMesh(2, 2, 2)
    space = FunctionSpace(mesh, 1, bs=3)
    nv = mesh.num_vertices_global
    u = np.arange(3 * space.ndofs_scalar, dtype=np.float64)
    fn = str(tmp_path / "vec.xdmf")
    write_xdmf(fn, mesh, u, bs=3, space=space)
    got = read_xdmf(fn)
    assert got["values"].shape == (nv, 3)
    np.testing.assert_allclose(got["values"], u.reshape(-1, 3)[:nv])
    # the .xdmf XML advertises a Vector attribute
    xml = open(fn).read()
    assert 'AttributeType="Vector"' in xml
