"""Pallas TPU kernel: fused P1 stencil apply.

The XLA DIA apply (tpufem.fem.dia_op) issues one multiply-add pass per
shift diagonal, so the input grid is re-read up to 15x from HBM.  This
kernel fuses all diagonals into a single pass over z-tiles held in VMEM.

Two weight forms:

- const-mode DiaOperator (the production P1 form): the per-diagonal
  interior constants are baked into the kernel as *static scalars* — the
  kernel streams only the input grid, and the thin boundary/BC correction
  slabs are added outside the kernel by ordinary XLA slice ops (their
  traffic is O(surface)).  This is the bandwidth-optimal path: ~2 grid
  reads + 1 write per apply instead of 16+ array passes.
- dense-mode DiaOperator (small lattices, irregular BC): per-diagonal
  full-grid weight arrays are streamed alongside the input (legacy path).

Halo handling: this environment's remote Mosaic compiler rejects the
manual-DMA (run_scoped + make_async_copy) halo pattern, so the kernel
instead takes three z-shifted views of the zero-padded input (z-1, z,
z+1) as ordinary blocked VMEM operands — every shifted read is then a
static in-block slice.  In-plane (x, y) shifts use the pad columns.

Numerical equality with the XLA apply is asserted in tests (interpret
mode on CPU and bit-exact against the XLA path on TPU).  P1 scalar only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# scalar-weight kernel (const-mode operators)
# ---------------------------------------------------------------------------


def _make_scalar_kernel(offsets, weights, TZ, Y, X, dtype):
    def kernel(xl_ref, xm_ref, xh_ref, out_ref):
        planes = {-1: xl_ref, 0: xm_ref, 1: xh_ref}
        acc = jnp.zeros((TZ, Y, X), dtype=dtype)
        for (dx, dy, dz), w in zip(offsets, weights):
            src = planes[dz][:, 1 + dy: 1 + dy + Y, 1 + dx: 1 + dx + X]
            acc = acc + w * src
        out_ref[:, :, :] = acc

    return kernel


def _zviews(x, dims, tz):
    """Zero-padded input grid as three z-shifted [ztot, Y+2, X+2] views."""
    X, Y, Z = dims
    xg = x.reshape(Z, Y, X)
    xpad = jnp.pad(xg, ((1, 1), (1, 1), (1, 1)))
    nz = -(-Z // tz)
    zpad = nz * tz - Z
    if zpad:
        xpad = jnp.pad(xpad, ((0, zpad), (0, 0), (0, 0)))
    ztot = nz * tz
    return (xpad[0: ztot], xpad[1: 1 + ztot], xpad[2: 2 + ztot]), nz, ztot


@functools.partial(jax.jit, static_argnames=("offsets", "weights", "dims",
                                             "tz", "interpret"))
def stencil_apply_pallas_scalar(x: jnp.ndarray,
                                offsets: Tuple[Tuple[int, int, int], ...],
                                weights: Tuple[float, ...],
                                dims: Tuple[int, int, int], tz: int = 16,
                                interpret: bool = False) -> jnp.ndarray:
    """y = sum_d w_d * shift(x, d) over the FULL grid with zero padding
    (grid-boundary truncation is automatic; BC/boundary corrections are
    the caller's).  weights are static per-diagonal scalars."""
    X, Y, Z = dims
    (xl, xm, xh), nz, ztot = _zviews(x, dims, tz)
    kern = _make_scalar_kernel(offsets, weights, tz, Y, X, x.dtype)
    zblock = pl.BlockSpec((tz, Y + 2, X + 2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nz,),
        in_specs=[zblock, zblock, zblock],
        out_specs=pl.BlockSpec((tz, Y, X), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ztot, Y, X), x.dtype),
        interpret=interpret,
    )(xl, xm, xh)
    return out[:Z].reshape(-1)


def _face_slabs(Lz, Ly, Lx, m):
    """Disjoint cover of the boundary shell by six thin slabs."""
    return ((0, m, 0, Ly, 0, Lx), (Lz - m, Lz, 0, Ly, 0, Lx),
            (m, Lz - m, 0, m, 0, Lx), (m, Lz - m, Ly - m, Ly, 0, Lx),
            (m, Lz - m, m, Ly - m, 0, m), (m, Lz - m, m, Ly - m, Lx - m, Lx))


def dia_const_parts(op):
    """(offsets, interior scalars, correction slabs) of a const-mode P1
    scalar DiaOperator: per diagonal the interior constant for the
    kernel, plus thin host-materialized boundary-difference slabs
    (bounds, array) in dst-slice coordinates.

    Raises ValueError when the operator is not const-mode P1 scalar."""
    from tpufem.fem.dia_op import _SHELL, _clamp_index, _overlap
    lay = op.layout
    if lay.order != 1 or op.bs != 1 or not op.is_const():
        raise ValueError("pallas scalar path needs a const-mode P1 "
                         "scalar operator")
    Z, Y, X = lay.Nz + 1, lay.Ny + 1, lay.Nx + 1
    m = _SHELL + 1
    offsets, weights, corrs = [], [], []
    for meta, T in op.terms():
        d = meta[4]
        offsets.append(tuple(int(v) for v in d))
        Tn = np.asarray(T, dtype=np.float64)
        w0 = Tn[Tn.shape[0] // 2, Tn.shape[1] // 2, Tn.shape[2] // 2]
        weights.append(float(w0))
        # difference field on the real dst slice, sampled via clamp maps
        z0, z1, y0, y1, x0, x1 = meta[5]
        Lz, Ly, Lx = z1 - z0, y1 - y0, x1 - x0
        qz = _clamp_index(Z, Tn.shape[0], m)[z0:z1]
        qy = _clamp_index(Y, Tn.shape[1], m)[y0:y1]
        qx = _clamp_index(X, Tn.shape[2], m)[x0:x1]
        slabs = []
        for (a0, a1, b0, b1, c0, c1) in _face_slabs(Lz, Ly, Lx, m):
            if a0 >= a1 or b0 >= b1 or c0 >= c1:
                continue
            sub = Tn[np.ix_(qz[a0:a1], qy[b0:b1], qx[c0:c1])] - w0
            if sub.any():
                slabs.append(((a0, a1, b0, b1, c0, c1),
                              sub.astype(np.asarray(T).dtype)))
        # the kernel applies w0 over the FULL padded grid; outside the
        # dst slice the true weight is zero, but the padded input is
        # zero there too, so only in-slice differences need patching
        corrs.append(tuple(slabs))
    return tuple(offsets), tuple(weights), corrs


def apply_corrections(op, corr_parts, x: jnp.ndarray) -> jnp.ndarray:
    """Thin-slab correction contributions (the difference between the
    true operator and the pure interior-constant stencil over the
    zero-padded grid).  O(surface) traffic; composed with the Pallas
    core by the callers."""
    lay = op.layout
    Z, Y, X = lay.Nz + 1, lay.Ny + 1, lay.Nx + 1
    xg = x.reshape(Z, Y, X)
    out = jnp.zeros_like(xg)
    for meta, slabs in zip(op.plan, corr_parts):
        (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1), _c) = meta
        for (a0, a1, b0, b1, c0, c1), cw in slabs:
            sub = xg[z0 + a0 + d[2]: z0 + a1 + d[2],
                     y0 + b0 + d[1]: y0 + b1 + d[1],
                     x0 + c0 + d[0]: x0 + c1 + d[0]]
            out = out.at[z0 + a0: z0 + a1, y0 + b0: y0 + b1,
                         x0 + c0: x0 + c1].add(jnp.asarray(cw) * sub)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# dense-weight kernel (legacy / irregular operators)
# ---------------------------------------------------------------------------


def _make_kernel(offsets, TZ, Y, X, dtype):
    def kernel(xl_ref, xm_ref, xh_ref, w_ref, out_ref):
        planes = {-1: xl_ref, 0: xm_ref, 1: xh_ref}
        acc = jnp.zeros((TZ, Y, X), dtype=dtype)
        for d, (dx, dy, dz) in enumerate(offsets):
            src = planes[dz][:, 1 + dy: 1 + dy + Y, 1 + dx: 1 + dx + X]
            acc = acc + w_ref[d] * src
        out_ref[:, :, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("offsets", "dims", "tz",
                                             "interpret"))
def stencil_apply_pallas(x: jnp.ndarray, weights: jnp.ndarray,
                         offsets: Tuple[Tuple[int, int, int], ...],
                         dims: Tuple[int, int, int], tz: int = 16,
                         interpret: bool = False) -> jnp.ndarray:
    """y = stencil(x): x flat [Z*Y*X], weights [D, Z, Y, X] (zero-padded
    full-grid diagonal weights), offsets[d] = (dx, dy, dz) in {-1,0,1}."""
    X, Y, Z = dims
    D = weights.shape[0]
    (xl, xm, xh), nz, ztot = _zviews(x, dims, tz)
    zpad = ztot - Z
    if zpad:
        weights = jnp.pad(weights, ((0, 0), (0, zpad), (0, 0), (0, 0)))

    kern = _make_kernel(offsets, tz, Y, X, x.dtype)
    zblock = pl.BlockSpec((tz, Y + 2, X + 2), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nz,),
        in_specs=[zblock, zblock, zblock,
                  pl.BlockSpec((D, tz, Y, X), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tz, Y, X), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ztot, Y, X), x.dtype),
        interpret=interpret,
    )(xl, xm, xh, weights)
    return out[:Z].reshape(-1)


def dia_weights_dense(op) -> Tuple[jnp.ndarray, Tuple[Tuple[int, int, int], ...]]:
    """Expand a P1 DiaOperator's weights (const or dense terms) to
    full-grid [D, Z, Y, X] arrays + the offset tuple (kernel inputs)."""
    lay = op.layout
    if lay.order != 1 or op.bs != 1:
        raise ValueError("pallas stencil path is P1 scalar only")
    Z, Y, X = lay.Nz + 1, lay.Ny + 1, lay.Nx + 1
    out = []
    offsets = []
    for meta, W in op.terms():
        (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1), corrs) = meta
        dense = jnp.asarray(op._dense_weight_np(meta, np.asarray(W)),
                            dtype=W.dtype)
        full = jnp.zeros((Z, Y, X), dtype=W.dtype)
        full = full.at[z0:z1, y0:y1, x0:x1].set(dense)
        out.append(full)
        offsets.append(tuple(int(v) for v in d))
    return jnp.stack(out), tuple(offsets)


def auto_tz(D: int, Y: int, X: int, itemsize: int = 4,
            vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest z-tile whose operands fit in VMEM.

    D = number of streamed dense weight arrays (0 for the scalar-weight
    kernel).  Accounts for Mosaic tiling: the minor dim pads to 128
    lanes, the second-minor to 8 sublanes, and the pipeline
    double-buffers every block.  Exceeding VMEM crashes the remote Mosaic
    compile (HTTP 500 from the tunnel's compile helper, no diagnostics),
    so stay well under."""
    def pad(v, m):
        return -(-v // m) * m
    Xp = pad(X + 2, 128)
    Yp = pad(Y + 2, 8)
    per_z = (D + 3 + 1) * Yp * Xp * itemsize * 2  # x2: double buffering
    tz = max(1, vmem_budget // per_z)
    p = 1
    while p * 2 <= tz:
        p *= 2
    return min(p, 64)


def dia_apply_pallas(op, x: jnp.ndarray, interpret: bool = False,
                     tz: int = 0) -> jnp.ndarray:
    """Fused-stencil equivalent of DiaOperator.apply (P1 scalar);
    tz = 0 picks the largest VMEM-safe z-tile.  Scalar-weight kernel +
    XLA corrections for const-mode operators, dense-weight kernel
    otherwise."""
    lay = op.layout
    dims = (lay.Nx + 1, lay.Ny + 1, lay.Nz + 1)
    itemsize = np.dtype(x.dtype).itemsize
    try:
        offsets, scalars, corrs = dia_const_parts(op)
    except ValueError:
        weights, offsets = dia_weights_dense(op)
        if tz == 0:
            tz = auto_tz(weights.shape[0], dims[1], dims[0], itemsize)
        return stencil_apply_pallas(x, weights, offsets, dims,
                                    tz=tz, interpret=interpret)
    if tz == 0:
        tz = auto_tz(0, dims[1], dims[0], itemsize)
    y = stencil_apply_pallas_scalar(x, offsets, scalars, dims,
                                    tz=tz, interpret=interpret)
    return y + apply_corrections(op, corrs, x)


@jax.tree_util.register_pytree_node_class
class PallasStencilOp:
    """Pytree operator wrapping the fused stencil kernel (jit-arg safe);
    exposes the cgpoisson rows-zero apply.  Wraps the source DiaOperator:
    interior constants are static scalars baked into the kernel, the thin
    correction slabs stay dynamic leaves applied by XLA."""

    def __init__(self, dia, offsets, scalars, corrs, dims):
        self.dia = dia
        self.offsets = offsets
        self.scalars = scalars
        self.corrs = corrs
        self.dims = dims

    def tree_flatten(self):
        arrs = tuple(tuple(cw for _b, cw in slabs) for slabs in self.corrs)
        bounds = tuple(tuple(b for b, _cw in slabs) for slabs in self.corrs)
        return (self.dia, arrs), (self.offsets, self.scalars, bounds,
                                  self.dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, scalars, bounds, dims = aux
        dia, arrs = children
        corrs = tuple(tuple(zip(b, a)) for b, a in zip(bounds, arrs))
        return cls(dia, offsets, scalars, corrs, dims)

    @classmethod
    def from_dia(cls, op) -> "PallasStencilOp":
        offsets, scalars, corrs = dia_const_parts(op)
        lay = op.layout
        return cls(op, offsets, scalars, corrs,
                   (lay.Nx + 1, lay.Ny + 1, lay.Nz + 1))

    @property
    def bc_mask(self):
        return self.dia.bc_mask

    def apply(self, x):
        tz = auto_tz(0, self.dims[1], self.dims[0],
                     np.dtype(x.dtype).itemsize)
        y = stencil_apply_pallas_scalar(
            x, self.offsets, self.scalars, self.dims, tz=tz,
            # Mosaic is TPU-only; CPU (tests, the virtual multi-device
            # mesh) interprets
            interpret=jax.default_backend() != "tpu")
        return y + apply_corrections(self.dia, self.corrs, x)

    def apply_bc_rows_zero(self, x):
        return jnp.where(self.dia.bc_mask, 0.0, self.apply(x))
