"""Mesh tests: closed-form numbering vs the reference's entity-count model
(reference: src/mesh.cpp:44-74) and basic conformity/geometry checks."""

import numpy as np
import pytest

from tpufem.mesh import BoxTetMesh, TetTopology, compute_box_size, num_entities, num_pdofs


@pytest.mark.parametrize("dims", [(1, 1, 1), (2, 3, 4), (5, 2, 3)])
def test_entity_counts_match_model(dims):
    """The generated mesh must reproduce the closed-form counts that the
    reference uses for dof targeting (src/mesh.cpp:44-54)."""
    nx, ny, nz = dims
    mesh = BoxTetMesh(nx, ny, nz)
    nv, ne, nf, nc = num_entities(nx, ny, nz)
    assert mesh.num_vertices_global == nv
    assert mesh.num_edges_global == ne
    assert mesh.num_faces_global == nf
    assert mesh.num_cells_global == nc
    # cross-check against generic sorted-unique topology
    lat = mesh.cell_vertex_lattice()
    verts = np.stack(np.meshgrid(np.arange(nz + 1), np.arange(ny + 1),
                                 np.arange(nx + 1), indexing="ij"),
                     axis=-1)[..., ::-1].reshape(-1, 3).astype(float)
    topo = TetTopology(verts, mesh.cells())
    assert topo.num_edges_global == ne
    assert topo.num_faces_global == nf


@pytest.mark.parametrize("dims", [(1, 1, 1), (2, 3, 4)])
def test_cell_entity_maps_consistent(dims):
    """cell_edges/cell_faces closed-form gids agree with sorted-unique
    derivation, and gids are a bijection onto [0, n)."""
    nx, ny, nz = dims
    mesh = BoxTetMesh(nx, ny, nz)
    cells = mesh.cells()

    edges, flipped = mesh.cell_edges()
    faces = mesh.cell_faces()
    assert set(np.unique(edges)) == set(range(mesh.num_edges_global))
    assert set(np.unique(faces)) == set(range(mesh.num_faces_global))

    # every (cell, local edge) with the same gid must connect the same vertices
    ev = mesh.edge_vertices(edges.ravel()).reshape(*edges.shape, 2)
    from tpufem.mesh.structured import LOCAL_EDGES
    pair = cells[:, LOCAL_EDGES]  # [C, 6, 2]
    assert np.array_equal(np.sort(ev, axis=-1), np.sort(pair, axis=-1))
    # flip flag: local first vertex > second  <=>  opposes anchored direction
    assert np.array_equal(flipped, pair[..., 0] > pair[..., 1])

    fv = mesh.face_vertices(faces.ravel()).reshape(*faces.shape, 3)
    from tpufem.mesh.structured import LOCAL_FACES
    tri = cells[:, LOCAL_FACES]
    assert np.array_equal(np.sort(fv, axis=-1), np.sort(tri, axis=-1))

    # face_edges of every face connect face vertices
    fe = mesh.face_edges(np.arange(mesh.num_faces_global))
    fvv = mesh.face_vertices(np.arange(mesh.num_faces_global))
    ev2 = mesh.edge_vertices(fe.ravel()).reshape(-1, 3, 2)
    for i in range(3):
        assert np.all(np.isin(ev2[:, i, :], fvv).all(axis=-1))


def test_positive_volumes_and_total():
    mesh = BoxTetMesh(3, 4, 5)
    x = mesh.cell_coords()
    J = x[:, 1:4, :] - x[:, 0:1, :]
    det = np.linalg.det(J)
    assert (det > 0).all()
    assert np.isclose(det.sum() / 6.0, 1.0)  # unit cube volume


def test_slab_decomposition_covers():
    mesh = BoxTetMesh(2, 3, 4)
    full = mesh.cells()
    parts = [BoxTetMesh(2, 3, 4, z_lo=a, z_hi=b).cells()
             for a, b in ((0, 1), (1, 3), (3, 4))]
    assert np.array_equal(np.concatenate(parts, axis=0), full)
    offs = [BoxTetMesh(2, 3, 4, z_lo=a, z_hi=b).cell_offset()
            for a, b in ((0, 1), (1, 3), (3, 4))]
    assert offs == [0, 6 * 2 * 3, 3 * 6 * 2 * 3]


def test_boundary_facets():
    nx, ny, nz = 2, 3, 4
    mesh = BoxTetMesh(nx, ny, nz)
    bf = mesh.boundary_faces()
    # 2 triangles per boundary square
    expect = 2 * 2 * (nx * ny + nx * nz + ny * nz)
    assert bf.shape[0] == expect
    # generic topology agrees
    verts = np.stack(np.meshgrid(np.arange(nz + 1), np.arange(ny + 1),
                                 np.arange(nx + 1), indexing="ij"),
                     axis=-1)[..., ::-1].reshape(-1, 3).astype(float)
    topo = TetTopology(verts, mesh.cells())
    assert topo.boundary_faces().shape[0] == expect

    # locate x=0 / x=1 planes (the Poisson BC predicate,
    # reference src/poisson_problem.cpp:58-71)
    marked = mesh.locate_boundary_facets(
        lambda x: (np.abs(x[:, 0]) < 1e-8) | (np.abs(x[:, 0] - 1) < 1e-8))
    assert marked.shape[0] == 2 * 2 * ny * nz


@pytest.mark.parametrize("order,target", [(1, 50000), (2, 50000), (3, 200000)])
def test_size_search(order, target):
    """Sizing must land near the dof target (reference: src/mesh.cpp:86-151)."""
    nx, ny, nz, r = compute_box_size(target, True, 1, order, 1)
    got = num_pdofs(nx, ny, nz, r, order)
    assert abs(got - target) / target < 0.05


def test_size_search_weak_scaling():
    nx, ny, nz, r = compute_box_size(50000, False, 1, 1, 8)
    got = num_pdofs(nx, ny, nz, r, 1)
    assert abs(got - 400000) / 400000 < 0.05
