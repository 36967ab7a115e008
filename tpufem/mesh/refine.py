"""Tetrahedral mesh refinement (host-side, for the unstructured path).

Equivalent of ``dolfinx::refinement::refine`` (reference call sites:
src/mesh.cpp:196-204 uniform, src/mesh.cpp:414-417 marked-edge Plaza).
The structured cube path never calls this — dyadic refinement there is
closed-form regeneration (tpufem.mesh.structured).  The spoke mesh uses:

- ``uniform_refine``: 1:8 red refinement via edge midpoints, central
  octahedron split along its shortest diagonal;
- ``refine_marked_edges``: conforming local refinement by iterated
  longest-marked-edge bisection with closure (Plaza-style behavior:
  marked edges are split, plus whatever closure demands).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tpufem.mesh.structured import LOCAL_EDGES


def _edge_keys(cells: np.ndarray, nv: int) -> np.ndarray:
    """[C, 6] canonical int keys of each cell's edges."""
    pairs = cells[:, LOCAL_EDGES]
    lo = pairs.min(axis=-1).astype(np.int64)
    hi = pairs.max(axis=-1).astype(np.int64)
    return lo * nv + hi


def uniform_refine(vertices: np.ndarray,
                   cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """One level of red (1:8) refinement."""
    nv = vertices.shape[0]
    keys = _edge_keys(cells, nv)  # [C, 6]
    from tpufem.native import unique_inverse_u64
    uniq, inv = unique_inverse_u64(keys.ravel())
    mid_ids = nv + inv.reshape(-1, 6)  # [C, 6] new vertex id per local edge
    mids = 0.5 * (vertices[(uniq // nv)] + vertices[(uniq % nv)])
    new_verts = np.concatenate([vertices, mids], axis=0)

    # local edge index between local vertices (a, b)
    eidx = np.full((4, 4), -1, dtype=np.int64)
    for e, (a, b) in enumerate(LOCAL_EDGES):
        eidx[a, b] = eidx[b, a] = e

    v = cells  # [C, 4]
    m = lambda a, b: mid_ids[:, eidx[a, b]]
    # 4 corner tets
    children = [
        np.stack([v[:, 0], m(0, 1), m(0, 2), m(0, 3)], axis=1),
        np.stack([v[:, 1], m(0, 1), m(1, 2), m(1, 3)], axis=1),
        np.stack([v[:, 2], m(0, 2), m(1, 2), m(2, 3)], axis=1),
        np.stack([v[:, 3], m(0, 3), m(1, 3), m(2, 3)], axis=1),
    ]
    # central octahedron: shortest of the 3 diagonals per cell
    d_pairs = [((0, 1), (2, 3)), ((0, 2), (1, 3)), ((0, 3), (1, 2))]
    dlen = np.stack([
        np.linalg.norm(new_verts[m(*p)] - new_verts[m(*q)], axis=1)
        for p, q in d_pairs], axis=1)  # [C, 3]
    choice = np.argmin(dlen, axis=1)  # [C]
    # equator cycles for each diagonal choice (pairs adjacent in octa)
    octa_tets = []
    for (p, q), cyc in (
            (((0, 1), (2, 3)), [(0, 2), (0, 3), (1, 3), (1, 2)]),
            (((0, 2), (1, 3)), [(0, 1), (0, 3), (2, 3), (1, 2)]),
            (((0, 3), (1, 2)), [(0, 1), (0, 2), (2, 3), (1, 3)])):
        A, B = m(*p), m(*q)
        e = [m(*ab) for ab in cyc]
        octa_tets.append(np.stack([
            np.stack([A, B, e[0], e[1]], axis=1),
            np.stack([A, B, e[1], e[2]], axis=1),
            np.stack([A, B, e[2], e[3]], axis=1),
            np.stack([A, B, e[3], e[0]], axis=1),
        ], axis=1))  # [C, 4tets, 4]
    octa = np.stack(octa_tets, axis=1)  # [C, 3choice, 4, 4]
    octa = octa[np.arange(cells.shape[0]), choice]  # [C, 4, 4]
    children.append(octa[:, 0])
    children.append(octa[:, 1])
    children.append(octa[:, 2])
    children.append(octa[:, 3])
    new_cells = np.concatenate([c[:, None, :] for c in children], axis=1)
    return new_verts, new_cells.reshape(-1, 4)


def refine_marked_edges(vertices: np.ndarray, cells: np.ndarray,
                        marked_edge_verts: np.ndarray,
                        max_passes: int = 200) -> Tuple[np.ndarray, np.ndarray]:
    """Conforming local refinement: split the given edges (as [n, 2]
    vertex pairs) by iterated longest-edge bisection.

    Every cell containing a to-split edge is bisected by its globally
    longest edge (ties broken by edge key — a consistent total order, so
    neighbors agree and the recursion terminates); children containing
    still-marked edges are re-processed until no marked edge remains.
    Plaza-equivalent capability: all marked edges end up split and the
    mesh stays conforming.
    """
    verts = vertices
    cells = cells.copy()

    def key_of(a, b):
        lo = np.minimum(a, b).astype(np.int64)
        hi = np.maximum(a, b).astype(np.int64)
        return lo * (1 << 32) + hi

    mk = np.asarray(marked_edge_verts, dtype=np.int64)
    split_keys = np.unique(key_of(mk[:, 0], mk[:, 1]))

    for _ in range(max_passes):
        pairs = cells[:, LOCAL_EDGES]  # [C, 6, 2]
        keys = key_of(pairs[..., 0], pairs[..., 1])
        need = np.isin(keys, split_keys).any(axis=1)
        if not need.any():
            break
        # globally-consistent longest edge: (length, key) lexicographic max
        # (neighbors agree, so the recursion terminates per LEB theory)
        elen = np.linalg.norm(verts[pairs[..., 0]] - verts[pairs[..., 1]],
                              axis=-1)
        maxlen = elen.max(axis=1, keepdims=True)
        keysel = np.where(elen == maxlen, keys, -1)
        longest = np.argmax(keysel, axis=1)

        # propagation: the chosen bisection edges themselves become
        # to-split edges (their midpoints would otherwise hang in
        # untouched neighbors); enlarge the set until fixed point
        chosen = np.unique(keys[need, longest[need]])
        new = np.setdiff1d(chosen, split_keys)
        if new.size:
            split_keys = np.union1d(split_keys, new)
            continue

        bis = np.flatnonzero(need)
        lidx = longest[bis]
        la = LOCAL_EDGES[lidx, 0]
        lb = LOCAL_EDGES[lidx, 1]
        va = cells[bis, la]
        vb = cells[bis, lb]
        bkeys = key_of(va, vb)
        ukeys, inv = np.unique(bkeys, return_inverse=True)
        mid_ids = verts.shape[0] + np.arange(ukeys.shape[0])
        a = ukeys >> 32
        b = ukeys & ((1 << 32) - 1)
        verts = np.concatenate([verts, 0.5 * (verts[a] + verts[b])])
        mid = mid_ids[inv]

        ch1 = cells[bis].copy()
        ch1[np.arange(bis.size), la] = mid
        ch2 = cells[bis].copy()
        ch2[np.arange(bis.size), lb] = mid
        cells = np.concatenate([cells[~need], ch1, ch2], axis=0)
        # keep only split edges still present somewhere (an edge leaves
        # the set exactly when no remaining cell contains it whole)
        pairs = cells[:, LOCAL_EDGES]
        present = np.unique(key_of(pairs[..., 0], pairs[..., 1]))
        split_keys = np.intersect1d(split_keys, present)

    return verts, cells
