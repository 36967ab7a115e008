"""XDMF/HDF5 output of mesh + solution.

Equivalent of ``dolfinx::io::XDMFFile::write_mesh/write_function``
(reference call site: src/main.cpp:213-223, gated by --output).  Writes
an XDMF3 XML index referencing heavy data in an HDF5 sidecar (h5py).
Vertex coordinates for the structured mesh are materialized on demand;
P2/P3 functions are written at the P1 subset (vertex values), matching
common practice for visualization output.
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
               bs: int = 1, name: str = "u") -> None:
    """Write mesh (+ optional nodal function) to ``filename`` (.xdmf)
    with an HDF5 sidecar next to it."""
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
            if bs > 1:
                vals = vals.reshape(-1, bs)[:nverts]
            else:
                vals = vals[:nverts]
            f.create_dataset("/function/values", data=vals)

    xml = _XDMF_TEMPLATE.format(
        ncells=cells.shape[0], nverts=nverts, h5name=h5name,
        attr_name=name, attr_type="Vector" if bs > 1 else "Scalar",
        attr_dim=bs)
    with open(filename, "w") as f:
        f.write(xml)
