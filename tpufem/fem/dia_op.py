"""Generalized DIA (diagonal-stencil) operator on the structured lattice.

The assembled-matrix representation for the cube path: instead of storing
a sparse matrix with explicit column indices (gather-heavy, TPU-hostile),
the matrix is stored as a set of *shift diagonals* between typed dof
grids:

  y[dst](z, y, x) += W[(dst, src, delta)](z, y, x) * x[src](z+dz, y+dy, x+dx)

Every entry of the BC-eliminated stiffness matrix lands on one of a few
dozen (dst-kind/slot, src-kind/slot, lattice shift) triples (15 for P1),
because cell couplings on the Kuhn lattice have constant offsets (see
tpufem.fem.structured_op).  The apply is then a handful of elementwise
multiply-adds over contiguous slices — the fastest primitive on TPU, no
gathers, no matmuls (hence no bf16 precision loss), and a tiny HLO (the
unrolled multigrid V-cycle compiles quickly).

Dirichlet elimination (zeroed rows/cols + unit diagonal, reference
poisson_problem.cpp:134) is baked into the weights, so apply() is exactly
the reference's assembled operator.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.structured_op import (GridLayout, dof_slice_plan,
                                      grid_layout, perm_element_matrices)
from tpufem.mesh.structured import BoxTetMesh


def _overlap(Zo, Yo, Xo, Zi, Yi, Xi, d):
    """Static dst-slice bounds such that src = dst + d stays in range."""
    dz, dy, dx = d[2], d[1], d[0]
    z0, z1 = max(0, -dz), min(Zo, Zi - dz)
    y0, y1 = max(0, -dy), min(Yo, Yi - dy)
    x0, x1 = max(0, -dx), min(Xo, Xi - dx)
    return (z0, z1, y0, y1, x0, x1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaOperator:
    """Block-DIA stencil matrix between typed dof grids.

    weights: list of [z1-z0, y1-y0, x1-x0] (+ (bs, bs)) arrays, one per
    (dst, src, shift) triple; static ``plan`` holds the triple metadata.
    """

    weights: List[jnp.ndarray]
    bc_mask: jnp.ndarray   # flat [ndofs*bs] bool (elimination also baked in;
    #                        kept for transfer filtering in multigrid)
    plan: Tuple            # static: tuple of (dst_kind, dst_slot, src_kind,
    #                        src_slot, (dx, dy, dz), dst slice bounds)
    layout: GridLayout     # static
    bs: int                # static

    def tree_flatten(self):
        return (tuple(self.weights), self.bc_mask), (self.plan, self.layout,
                                                     self.bs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        weights, bc_mask = children
        plan, layout, bs = aux
        return cls(list(weights), bc_mask, plan, layout, bs)

    # -- construction -----------------------------------------------------------
    @classmethod
    def build(cls, mesh: BoxTetMesh, order: int, problem: str,
              bc_dofs: Optional[np.ndarray] = None,
              dtype=jnp.float32, h_override=None,
              z_cubes: Optional[int] = None,
              bake_bc: bool = True) -> "DiaOperator":
        """``z_cubes`` limits weight accumulation to the first cube layers
        (shard-local slabs whose grids are padded to a common height).
        ``bake_bc=False`` records the BC mask without eliminating rows/cols
        in the weights (the matrix-free rows-zero convention)."""
        lay = grid_layout(mesh, order)
        splan = dof_slice_plan(order)
        Ap = perm_element_matrices(mesh, order, problem, h_override=h_override)
        bs = 3 if problem == "elasticity" else 1
        Nx, Ny, Nz = mesh.Nx, mesh.Ny, mesh.Nz
        if z_cubes is not None:
            Nz = z_cubes
        n = len(splan[0])

        kinds = lay.kinds
        gdims = [(k[1][2], k[1][1], k[1][0]) for k in kinds]  # (Z, Y, X)

        # accumulate constant coefficients per (dst, src, shift) onto
        # dst-grid-sized weight arrays (cube region shifted by dst offset)
        acc: Dict[Tuple, np.ndarray] = {}
        for p in range(6):
            A = Ap[p].reshape(n, bs, n, bs) if bs > 1 else \
                Ap[p].reshape(n, 1, n, 1)
            for lo, (ko, (ox, oy, oz), so) in enumerate(splan[p]):
                for li, (ki, (ix, iy, iz), si) in enumerate(splan[p]):
                    c = A[lo, :, li, :]  # [bs, bs]
                    if not np.any(c):
                        continue
                    key = (ko, so, ki, si, (ix - ox, iy - oy, iz - oz))
                    Zo, Yo, Xo = gdims[ko]
                    if key not in acc:
                        acc[key] = np.zeros((Zo, Yo, Xo, bs, bs))
                    acc[key][oz: oz + Nz, oy: oy + Ny, ox: ox + Nx] += c

        # bake BC elimination into the weights
        bc_grids = None
        if bake_bc and bc_dofs is not None and len(bc_dofs):
            mask = np.zeros(lay.ndofs * bs, dtype=bool)
            mask[bc_dofs] = True
            mask = mask.reshape(-1, bs)
            bc_grids = []
            for base, (X, Y, Z), s in kinds:
                seg = mask[base: base + X * Y * Z * s]
                bc_grids.append(seg.reshape(Z, Y, X, s, bs))

        plan = []
        weights = []
        for (ko, so, ki, si, d), W in sorted(acc.items()):
            Zo, Yo, Xo = gdims[ko]
            Zi, Yi, Xi = gdims[ki]
            z0, z1, y0, y1, x0, x1 = _overlap(Zo, Yo, Xo, Zi, Yi, Xi, d)
            Wc = W[z0:z1, y0:y1, x0:x1].copy()
            if bc_grids is not None:
                dst_bc = bc_grids[ko][z0:z1, y0:y1, x0:x1, so]  # [.., bs]
                src_bc = bc_grids[ki][z0 + d[2]: z1 + d[2],
                                      y0 + d[1]: y1 + d[1],
                                      x0 + d[0]: x1 + d[0], si]
                Wc = np.where(dst_bc[..., :, None], 0.0, Wc)
                Wc = np.where(src_bc[..., None, :], 0.0, Wc)
                if (ko, so, d) == (ki, si, (0, 0, 0)):
                    eye = np.eye(bs)
                    Wc = np.where(dst_bc[..., :, None], eye, Wc)
            if bs == 1:
                Wc = Wc[..., 0, 0]
            if not np.any(Wc):
                continue
            plan.append((ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1)))
            weights.append(jnp.asarray(Wc.astype(np.dtype(dtype))))

        flat_mask = np.zeros(lay.ndofs * bs, dtype=bool)
        if bc_dofs is not None and len(bc_dofs):
            flat_mask[bc_dofs] = True
        return cls(weights=weights, bc_mask=jnp.asarray(flat_mask),
                   plan=tuple(plan), layout=lay, bs=bs)

    # -- apply --------------------------------------------------------------
    def apply_bc_rows_zero(self, x: jnp.ndarray) -> jnp.ndarray:
        """cgpoisson convention: zero BC rows only
        (reference cgpoisson_problem.cpp:207)."""
        return jnp.where(self.bc_mask, 0.0, self.apply(x))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        lay = self.layout
        bs = self.bs
        xr = x.reshape((-1, bs)) if bs > 1 else x.reshape((-1, 1))
        grids = lay.split(xr)  # [Z, Y, X, slots, bs]
        out = [jnp.zeros_like(g) for g in grids]
        for W, (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1)) in zip(
                self.weights, self.plan):
            src = grids[ki][z0 + d[2]: z1 + d[2],
                            y0 + d[1]: y1 + d[1],
                            x0 + d[0]: x1 + d[0], si]  # [.., bs]
            if bs == 1:
                contrib = W * src[..., 0]
                out[ko] = out[ko].at[z0:z1, y0:y1, x0:x1, so, 0].add(contrib)
            else:
                contrib = jnp.einsum("...rs,...s->...r", W, src)
                out[ko] = out[ko].at[z0:z1, y0:y1, x0:x1, so, :].add(contrib)
        y = lay.join(out)
        return y.reshape(-1)

    # -- diagonal --------------------------------------------------------------
    def diagonal_np(self) -> np.ndarray:
        lay = self.layout
        bs = self.bs
        outs = [np.zeros((k[1][2], k[1][1], k[1][0], k[2], bs))
                for k in lay.kinds]
        for W, (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1)) in zip(
                self.weights, self.plan):
            if (ko, so, d) != (ki, si, (0, 0, 0)):
                continue
            Wn = np.asarray(W, dtype=np.float64)
            if bs == 1:
                outs[ko][z0:z1, y0:y1, x0:x1, so, 0] += Wn
            else:
                outs[ko][z0:z1, y0:y1, x0:x1, so, :] += np.diagonal(
                    Wn, axis1=-2, axis2=-1)
        return np.concatenate([o.reshape(-1, bs) for o in outs]).reshape(-1)

    def apply_np(self, x: np.ndarray) -> np.ndarray:
        """Host twin (setup-phase spectral estimates)."""
        lay = self.layout
        bs = self.bs
        xr = x.reshape(-1, bs)
        grids = [xr[b: b + X * Y * Z * s].reshape(Z, Y, X, s, bs)
                 for b, (X, Y, Z), s in lay.kinds]
        outs = [np.zeros_like(g) for g in grids]
        for W, (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1)) in zip(
                self.weights, self.plan):
            Wn = np.asarray(W, dtype=np.float64)
            src = grids[ki][z0 + d[2]: z1 + d[2], y0 + d[1]: y1 + d[1],
                            x0 + d[0]: x1 + d[0], si]
            if bs == 1:
                outs[ko][z0:z1, y0:y1, x0:x1, so, 0] += Wn * src[..., 0]
            else:
                outs[ko][z0:z1, y0:y1, x0:x1, so, :] += np.einsum(
                    "...rs,...s->...r", Wn, src)
        return np.concatenate([o.reshape(-1, bs) for o in outs]).reshape(-1)


def build_operator(mesh: BoxTetMesh, order: int, problem: str,
                   bc_dofs: Optional[np.ndarray] = None,
                   dtype=jnp.float32):
    """Pick the structured-operator representation by order:

    - P1: DIA stencil (7-15 shift diagonals — smallest HLO, pure VPU);
    - P2/P3: per-perm constant element matrices (StructuredOperator) —
      the DIA triple count grows ~quadratically with dofs/cell and would
      bloat compile times.
    Both expose apply / apply_np / diagonal_np / bc_mask.
    """
    if order == 1:
        return DiaOperator.build(mesh, order, problem, bc_dofs=bc_dofs,
                                 dtype=dtype)
    from tpufem.fem.structured_op import StructuredOperator
    return StructuredOperator.build(mesh, order, problem, bc_dofs=bc_dofs,
                                    dtype=dtype)
