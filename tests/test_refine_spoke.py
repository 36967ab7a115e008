"""Refinement + spoke mesh tests."""

import numpy as np
import pytest

from tpufem.mesh import BoxTetMesh, TetTopology
from tpufem.mesh.refine import refine_marked_edges, uniform_refine
from tpufem.mesh.spoke import build_spoke_geometry, create_spoke_mesh


def _volume(verts, cells):
    x = verts[cells]
    return np.abs(np.linalg.det(x[:, 1:4] - x[:, 0:1])).sum() / 6.0


def test_uniform_refine_counts_and_volume():
    """1:8 refinement must reproduce the dyadic entity model
    (reference src/mesh.cpp:44-54 with nrefine=1)."""
    box = BoxTetMesh(2, 2, 2)
    verts = box.vertex_coords(np.arange(box.num_vertices_global))
    cells = box.cells()
    v1, c1 = uniform_refine(verts, cells)
    assert c1.shape[0] == 8 * cells.shape[0]
    topo = TetTopology(v1, c1)
    from tpufem.mesh import num_entities
    nv, ne, nf, nc = num_entities(2, 2, 2, nrefine=1)
    assert topo.num_vertices_global == nv
    assert topo.num_cells_global == nc
    # volume preserved
    assert np.isclose(_volume(v1, c1), 1.0)
    # conforming: every interior face shared by exactly 2 cells
    assert topo.boundary_faces().shape[0] == 2 * 2 * 3 * (2 * 2) * 4


def test_marked_edge_refine_conforming():
    box = BoxTetMesh(2, 2, 2)
    verts = box.vertex_coords(np.arange(box.num_vertices_global))
    cells = box.cells()
    topo0 = TetTopology(verts, cells)
    ne = topo0.num_edges_global
    sel = np.arange(0, ne, 7)
    ev = topo0.edge_vertices(sel)
    v1, c1 = refine_marked_edges(verts, cells, ev)
    assert c1.shape[0] > cells.shape[0]
    assert np.isclose(_volume(v1, c1), 1.0)  # volume preserved
    topo = TetTopology(v1, c1)  # raises/garbage if nonconforming
    # conformity: face counts satisfy Euler-consistent 2-manifold boundary:
    # every face belongs to 1 or 2 cells (TetTopology asserts structure),
    # and boundary faces form the cube surface (area 6)
    bf = topo.boundary_faces()
    tri = v1[topo.face_vertices(bf)]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert np.isclose(area, 6.0)
    # all marked edges actually split: no cell contains a marked pair
    from tpufem.mesh.structured import LOCAL_EDGES
    pairs = np.sort(c1[:, LOCAL_EDGES], axis=-1).reshape(-1, 2)
    keys = set(map(tuple, pairs.tolist()))
    for a, b in np.sort(ev, axis=1).tolist():
        assert (a, b) not in keys


def test_spoke_geometry():
    verts, cells = build_spoke_geometry()
    assert verts.shape[0] == 17 * 4 + 17 * 6 * 4
    assert cells.shape[0] == 6 * 17 + 6 * 17 * 6
    topo = TetTopology(verts, cells)  # conforming & orientable
    x = verts[topo.cells()]
    det = np.linalg.det(x[:, 1:4] - x[:, 0:1])
    assert (det > 0).all()
    # ring wrap-around is watertight: interior faces exist between
    # ring hexes (boundary face count < total)
    assert topo.boundary_faces().shape[0] < topo.num_faces_global


def test_create_spoke_mesh_hits_target():
    topo = create_spoke_mesh(9000, True, 1, 1, verbose=False)
    got = topo.num_vertices_global
    # P1 dofs = vertices; the reference targets nv + marked-edge fraction,
    # accept a loose band (the reference's own search is heuristic)
    assert 5500 < got < 14000
