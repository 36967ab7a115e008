"""XDMF/HDF5 output of mesh + solution.

Equivalent of ``dolfinx::io::XDMFFile::write_mesh/write_function``
(reference call site: src/main.cpp:213-223, gated by --output).  Writes
an XDMF3 XML index referencing heavy data in an HDF5 sidecar (h5py).

Fidelity: the XDMF ``Attribute`` holds the function at mesh vertices
(for Lagrange spaces these are exact point values — the P1 "rendering"
common visualization tools expect).  For order >= 2 the FULL dof vector
is additionally written verbatim to ``/function/dofs`` together with
``/function/dof_coords`` (point-evaluation coordinates of every scalar
dof) and the cell->dof connectivity, so no information is lost: a
reader can reconstruct the exact finite-element function.
``read_xdmf`` round-trips everything back (pinned by
tests/test_xdmf.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


_XDMF_TEMPLATE = """<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0" xmlns:xi="https://www.w3.org/2001/XInclude">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="Tetrahedron" NumberOfElements="{ncells}">
        <DataItem Dimensions="{ncells} 4" NumberType="Int" Format="HDF">{h5name}:/mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="XYZ">
        <DataItem Dimensions="{nverts} 3" Format="HDF">{h5name}:/mesh/geometry</DataItem>
      </Geometry>
      <Attribute Name="{attr_name}" AttributeType="{attr_type}" Center="Node">
        <DataItem Dimensions="{nverts} {attr_dim}" Format="HDF">{h5name}:/function/values</DataItem>
      </Attribute>
    </Grid>
  </Domain>
</Xdmf>
"""


def write_xdmf(filename: str, mesh, u: Optional[np.ndarray] = None,
               bs: int = 1, name: str = "u", space=None) -> None:
    """Write mesh (+ optional nodal function) to ``filename`` (.xdmf)
    with an HDF5 sidecar next to it.

    ``space`` (a :class:`tpufem.fem.space.FunctionSpace`) enables the
    full-order datasets for order >= 2; without it only the vertex
    values are stored (exact for order 1)."""
    base, _ = os.path.splitext(filename)
    h5path = base + ".h5"
    h5name = os.path.basename(h5path)

    cells = np.asarray(mesh.cells(), dtype=np.int64)
    nverts = mesh.num_vertices_global
    coords = mesh.vertex_coords(np.arange(nverts, dtype=np.int64))

    import h5py
    with h5py.File(h5path, "w") as f:
        f.create_dataset("/mesh/topology", data=cells)
        f.create_dataset("/mesh/geometry", data=coords)
        if u is not None:
            vals = np.asarray(u)
            full = vals.reshape(-1, bs) if bs > 1 else vals.reshape(-1, 1)
            f.create_dataset("/function/values", data=full[:nverts])
            f.attrs["order"] = 1 if space is None else int(space.order)
            f.attrs["bs"] = int(bs)
            if space is not None and space.order >= 2:
                # full-order fidelity: verbatim dofs + their coordinates
                # + cell->dof map (enough to evaluate the FE function
                # anywhere; see reference src/main.cpp:218-222 where the
                # XDMFFile writes the full Function)
                f.create_dataset("/function/dofs", data=full)
                f.create_dataset("/function/dof_coords",
                                 data=space.scalar_dof_coords())
                f.create_dataset("/function/cell_dofs",
                                 data=np.asarray(space.cell_dofs,
                                                 dtype=np.int64))

    xml = _XDMF_TEMPLATE.format(
        ncells=cells.shape[0], nverts=nverts, h5name=h5name,
        attr_name=name, attr_type="Vector" if bs > 1 else "Scalar",
        attr_dim=bs)
    with open(filename, "w") as f:
        f.write(xml)


def read_xdmf(filename: str) -> dict:
    """Re-read an xdmf/h5 pair written by :func:`write_xdmf`.

    Returns a dict with ``topology``, ``geometry``, ``values`` (vertex
    values, [nverts, bs]) and — when present — ``dofs`` ([ndofs, bs]),
    ``dof_coords``, ``cell_dofs``, ``order``, ``bs``."""
    base, _ = os.path.splitext(filename)
    h5path = base + ".h5"
    import h5py
    out = {}
    with h5py.File(h5path, "r") as f:
        out["topology"] = f["/mesh/topology"][()]
        out["geometry"] = f["/mesh/geometry"][()]
        if "/function/values" in f:
            out["values"] = f["/function/values"][()]
            out["order"] = int(f.attrs.get("order", 1))
            out["bs"] = int(f.attrs.get("bs", 1))
        for key in ("dofs", "dof_coords", "cell_dofs"):
            if f"/function/{key}" in f:
                out[key] = f[f"/function/{key}"][()]
    return out
