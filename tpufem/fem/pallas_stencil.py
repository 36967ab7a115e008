"""Pallas TPU kernel: fused P1 stencil apply.

The XLA DIA apply (tpufem.fem.dia_op) issues one multiply-add pass per
shift diagonal, so the input grid is re-read up to 15x from HBM.  This
kernel fuses all diagonals into a single pass over z-tiles held in VMEM.

Halo handling: this environment's remote Mosaic compiler rejects the
manual-DMA (run_scoped + make_async_copy) halo pattern, so the kernel
instead takes three z-shifted views of the zero-padded input (z-1, z,
z+1) as ordinary blocked VMEM operands — every shifted read is then a
static in-block slice.  In-plane (x, y) shifts use the pad columns.

Opt-in (``dia_apply_pallas``): the XLA path remains the default;
numerical equality is asserted in tests (interpret mode on CPU and
against the XLA path on TPU).  P1 scalar only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    xg = x.reshape(Z, Y, X)
    xpad = jnp.pad(xg, ((1, 1), (1, 1), (1, 1)))
    nz = -(-Z // tz)
    zpad = nz * tz - Z
    if zpad:
        xpad = jnp.pad(xpad, ((0, zpad), (0, 0), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, zpad), (0, 0), (0, 0)))
    ztot = nz * tz
    xl = xpad[0: ztot]          # plane z - 1
    xm = xpad[1: 1 + ztot]      # plane z
    xh = xpad[2: 2 + ztot]      # plane z + 1

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
    """Expand a P1 DiaOperator's overlap-sliced weights to full-grid
    [D, Z, Y, X] arrays + the offset tuple (kernel inputs)."""
    lay = op.layout
    if lay.order != 1 or op.bs != 1:
        raise ValueError("pallas stencil path is P1 scalar only")
    Z, Y, X = lay.Nz + 1, lay.Ny + 1, lay.Nx + 1
    out = []
    offsets = []
    for W, (ko, so, ki, si, d, (z0, z1, y0, y1, x0, x1)) in zip(
            op.weights, op.plan):
        full = jnp.zeros((Z, Y, X), dtype=W.dtype)
        full = full.at[z0:z1, y0:y1, x0:x1].set(W)
        out.append(full)
        offsets.append(tuple(int(v) for v in d))
    return jnp.stack(out), tuple(offsets)


def auto_tz(D: int, Y: int, X: int, itemsize: int = 4,
            vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest z-tile whose operands fit in VMEM.

    Accounts for Mosaic tiling: the minor dim pads to 128 lanes, the
    second-minor to 8 sublanes, and the pipeline double-buffers every
    block.  Exceeding VMEM crashes the remote Mosaic compile (HTTP 500
    from the tunnel's compile helper, no diagnostics), so stay well
    under."""
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
    tz = 0 picks the largest VMEM-safe z-tile."""
    weights, offsets = dia_weights_dense(op)
    lay = op.layout
    dims = (lay.Nx + 1, lay.Ny + 1, lay.Nz + 1)
    if tz == 0:
        tz = auto_tz(weights.shape[0], dims[1], dims[0],
                     np.dtype(x.dtype).itemsize)
    return stencil_apply_pallas(x, weights, offsets, dims,
                                tz=tz, interpret=interpret)


@jax.tree_util.register_pytree_node_class
class PallasStencilOp:
    """Pytree operator wrapping the fused stencil kernel (jit-arg safe);
    exposes the cgpoisson rows-zero apply."""

    def __init__(self, weights, bc_mask, offsets, dims):
        self.weights = weights
        self.bc_mask = bc_mask
        self.offsets = offsets
        self.dims = dims

    def tree_flatten(self):
        return (self.weights, self.bc_mask), (self.offsets, self.dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        weights, bc_mask = children
        offsets, dims = aux
        return cls(weights, bc_mask, offsets, dims)

    @classmethod
    def from_dia(cls, op) -> "PallasStencilOp":
        weights, offsets = dia_weights_dense(op)
        lay = op.layout
        return cls(weights, op.bc_mask, offsets,
                   (lay.Nx + 1, lay.Ny + 1, lay.Nz + 1))

    def apply_bc_rows_zero(self, x):
        y = stencil_apply_pallas(x, self.weights, self.offsets, self.dims,
                                 tz=auto_tz(self.weights.shape[0],
                                            self.dims[1], self.dims[0],
                                            np.dtype(x.dtype).itemsize),
                                 # Mosaic is TPU-only; CPU (tests, the
                                 # virtual multi-device mesh) interprets
                                 interpret=jax.default_backend() != "tpu")
        return jnp.where(self.bc_mask, 0.0, y)
