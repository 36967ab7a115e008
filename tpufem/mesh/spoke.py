"""Unstructured "spoke" mesh: a ring of hexahedra with tapered, curled
spurs, split into tetrahedra.

Rebuild of ``create_spoke_mesh`` (reference: src/mesh.cpp:209-453).  Same
shape parameters and behavioral flow: serial generation, rescale, uniform
refinement until vertex+edge count reaches the dof target, then up to 5
rounds of local (marked-edge) refinement with a bisection search on the
marking fraction.  The hex -> 6-tet split here uses the Kuhn
decomposition on logical (ring, outward, vertical) coordinates, which is
conforming across shared quad faces (including the ring wrap-around) —
a different but equivalent decomposition from the reference's table.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from tpufem.mesh.refine import refine_marked_edges, uniform_refine
from tpufem.mesh.structured import CELL_VERTEX_OFFSETS
from tpufem.mesh.topology import TetTopology

# shape parameters (reference: src/mesh.cpp:218-230)
N_SPOKES = 17
R_INNER = 0.25
R_OUTER = 0.5
H_INNER = 1.2
H_OUTER = 1.0
L_SPUR = 6          # elements per spoke
L0 = 0.5            # element length along spoke
DTH = 0.15          # curl per element
TAPER = 0.9


def _hex_to_tets(corner_ids: np.ndarray) -> np.ndarray:
    """Split hexes into 6 tets each via the Kuhn decomposition.

    corner_ids: [H, 2, 2, 2] vertex ids indexed by logical (a, b, c)
    coordinates.  Returns [H * 6, 4].  Kuhn tets use monotone lattice
    paths, so shared faces (same logical plane) always carry the same
    diagonal — conforming without a shared-corner convention.
    """
    H = corner_ids.shape[0]
    offs = CELL_VERTEX_OFFSETS  # [6, 4, 3] in {0,1}
    tets = corner_ids[:, offs[..., 0], offs[..., 1], offs[..., 2]]  # [H, 6, 4]
    return tets.reshape(-1, 4)


def build_spoke_geometry() -> Tuple[np.ndarray, np.ndarray]:
    """(vertices [P, 3], cells [C, 4]) of the base spoke mesh."""
    n = N_SPOKES
    npts = 4 * n + 4 * n * L_SPUR
    x = np.zeros((npts, 3))

    # ring points: 4 per segment (inner-top, inner-bottom, outer-bottom,
    # outer-top), matching the reference's layout (mesh.cpp:274-285)
    th = 2.0 * np.pi * np.arange(n) / n
    x[0: 4 * n: 4] = np.stack([R_INNER * np.cos(th), R_INNER * np.sin(th),
                               np.full(n, H_INNER)], axis=1)
    x[1: 4 * n: 4] = np.stack([R_INNER * np.cos(th), R_INNER * np.sin(th),
                               np.full(n, -H_INNER)], axis=1)
    x[2: 4 * n: 4] = np.stack([R_OUTER * np.cos(th), R_OUTER * np.sin(th),
                               np.full(n, -H_OUTER)], axis=1)
    x[3: 4 * n: 4] = np.stack([R_OUTER * np.cos(th), R_OUTER * np.sin(th),
                               np.full(n, H_OUTER)], axis=1)

    hexes = []

    def ring_corner_grid(i: int) -> np.ndarray:
        """[2, 2, 2] ids for ring hex i: logical a = ring direction,
        b = radial (0 inner, 1 outer), c = vertical (0 bottom, 1 top)."""
        g = np.zeros((2, 2, 2), dtype=np.int64)
        for a, seg in ((0, i), (1, (i + 1) % N_SPOKES)):
            base = 4 * seg
            g[a, 0, 1] = base + 0   # inner top
            g[a, 0, 0] = base + 1   # inner bottom
            g[a, 1, 0] = base + 2   # outer bottom
            g[a, 1, 1] = base + 3   # outer top
        return g

    for i in range(N_SPOKES):
        hexes.append(ring_corner_grid(i))

    # spurs grow radially outward from each ring hex's outer face
    p = 4 * N_SPOKES
    for i in range(N_SPOKES):
        th0 = 2.0 * np.pi * (i + 0.5) / N_SPOKES
        ring = ring_corner_grid(i)
        inner = ring[:, 1, :]  # [a, c] outer face of the ring hex
        for k in range(L_SPUR):
            outer = np.zeros((2, 2), dtype=np.int64)
            for a in range(2):
                for c in range(2):
                    src = inner[a, c]
                    x[p] = x[src]
                    x[p, 0] += L0 * math.cos(th0 + k * DTH)
                    x[p, 1] += L0 * math.sin(th0 + k * DTH)
                    x[p, 2] *= TAPER ** k
                    outer[a, c] = p
                    p += 1
            g = np.zeros((2, 2, 2), dtype=np.int64)
            g[:, 0, :] = inner
            g[:, 1, :] = outer
            hexes.append(g)
            inner = outer

    cells = _hex_to_tets(np.stack(hexes))

    # rescale so the x-extent is ~[-1.1, 1.1] (reference mesh.cpp:339-355:
    # divide every coordinate by 0.9 * max|x0|)
    scale = 0.9 * np.abs(x[:, 0]).max()
    x /= scale
    return x, cells


def create_spoke_mesh(target_dofs: int, strong_scaling: bool,
                      dofs_per_node: int, num_shards: int,
                      verbose: bool = True) -> TetTopology:
    """Build the spoke mesh to a vertex+edge dof target
    (reference flow: src/mesh.cpp:362-452)."""
    target = target_dofs // dofs_per_node
    if not strong_scaling:
        target *= num_shards

    verts, cells = build_spoke_geometry()
    topo = TetTopology(verts, cells)

    # uniform refinement until nv + ne >= target
    while topo.num_vertices_global + topo.num_edges_global < target:
        verts, cells = uniform_refine(topo.vertices, topo.cells())
        topo = TetTopology(verts, cells)

    nv, ne = topo.num_vertices_global, topo.num_edges_global
    fraction = (target - nv) / ne
    if verbose:
        print(f"Create unstructured mesh: desired fraction={fraction}",
              flush=True)
    if fraction <= 0:
        return topo

    # bisection search on the number of marked edges per 2000.  Rounds
    # only need the refined VERTEX COUNT, so the topology (orientation +
    # derived entities) is constructed once, for the final selection —
    # a per-round TetTopology cost ~6.6 s of native edge derivation at
    # 2.6M cells on the deployment host.
    nmarked = int(fraction ** 1.6 * 2000)
    f_lower, f_upper = 0.0, 1.0
    lmark, umark = 0, 2000
    vc = (topo.vertices, topo.cells())
    for k in range(5):
        sel = np.flatnonzero(np.arange(ne) % 2000 < nmarked)
        ev = topo.edge_vertices(sel)
        vi, ci = refine_marked_edges(topo.vertices, topo.cells(), ev)
        vc = (vi, ci)
        actual = (vi.shape[0] - nv) / ne
        if verbose:
            print(f"Edges marked = {nmarked}/2000", flush=True)
            print(f"Step {k} achieved actual fraction = {actual}", flush=True)
        if actual > fraction:
            umark, f_upper = nmarked, actual
        else:
            lmark, f_lower = nmarked, actual
        new_mark = int((lmark * (f_upper - fraction)
                        + umark * (fraction - f_lower)) / (f_upper - f_lower))
        if nmarked == new_mark:
            break
        nmarked = new_mark
    return TetTopology(*vc)
