"""Sharded structured (stencil) matrix-free CG — the scalable flagship.

Combines the two TPU-native designs: the constant-stencil DIA operator
(tpufem.fem.dia_op — no gathers/scatters) and z-slab SPMD decomposition
(tpufem.parallel — ppermute plane halos).  Per CG iteration and shard:

  local stencil apply (shifted multiply-adds over the slab grids)
  -> reverse halo: the bottom interface plane's partial sums ride ONE
     ppermute down to their owner and accumulate
     (the scatter_rev(plus) analogue, reference poisson_problem.cpp:154)
  -> forward halo: the owner's top plane rides ONE ppermute up to
     refresh ghosts (scatter_fwd, cgpoisson_problem.cpp:224-229)
  -> psum dots.

Shards take equal slabs (Nz divisible by the shard count — natural for
GMG-sized lattices whose dims are 2^L-divisible), so every shard runs
the identical static program.  P1 scalar path (the weak-scaling
benchmark configuration).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpufem.fem.dia_op import DiaOperator
from tpufem.mesh.structured import BoxTetMesh


@dataclasses.dataclass
class ShardedStructuredPoisson:
    """Slab-sharded matrix-free Poisson CG (cgpoisson semantics:
    BC rows zeroed, b[bc] = 0)."""

    dia: DiaOperator            # per-shard weights stacked [S, ...]
    bc_mask: jnp.ndarray        # [S, nlocal]
    owned_mask: jnp.ndarray     # [S, nlocal]
    b_local: jnp.ndarray        # [S, nlocal]
    nplane: int                 # dofs per vertex plane
    nzl: int                    # cube layers per shard
    Nx: int
    Ny: int
    Nz: int
    mesh_axis: Mesh
    rtol: float
    kmax: int
    _cache: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def build(cls, box: BoxTetMesh, nshards: int, dtype=jnp.float32,
              rtol: float = 1e-6, kmax: int = 100, devices=None,
              order: int = 1) -> "ShardedStructuredPoisson":
        if order != 1:
            raise NotImplementedError("sharded structured path is P1")
        if box.Nz % nshards:
            raise ValueError(f"Nz={box.Nz} not divisible by {nshards} shards")
        from tpufem.fem.dirichlet import DirichletBC
        from tpufem.fem.space import FunctionSpace
        from tpufem.problems import common
        from tpufem.problems.poisson import assemble_poisson_rhs_np

        S = nshards
        nzl = box.Nz // S
        Nx, Ny = box.Nx, box.Ny
        nplane = (Nx + 1) * (Ny + 1)
        nlocal = (nzl + 1) * nplane
        h = (1.0 / box.Nx, 1.0 / box.Ny, 1.0 / box.Nz)

        # identical slab stencil for every shard (translation invariance);
        # per-shard BC masks (x in {0,1} planes exist on every slab)
        slab = BoxTetMesh(Nx, Ny, nzl)
        dia = DiaOperator.build(slab, 1, "poisson", dtype=dtype,
                                h_override=h)

        # global setup: BC dofs + RHS on the full box (host, closed form)
        space_g = FunctionSpace(box, 1)
        facets = box.locate_boundary_facets(common.poisson_bc_marker)
        bc = DirichletBC.from_space(space_g, facets)
        b_global = assemble_poisson_rhs_np(space_g)
        b_global[bc.flat_dofs()] = 0.0
        bc_mask_g = bc.mask()

        # distribute by vertex planes: shard s holds planes
        # [s*nzl, (s+1)*nzl] (plane s*nzl is the ghost for s > 0)
        b_loc = np.zeros((S, nlocal))
        bc_loc = np.zeros((S, nlocal), dtype=bool)
        owned = np.zeros((S, nlocal), dtype=bool)
        bg = b_global.reshape(box.Nz + 1, -1)
        mg = bc_mask_g.reshape(box.Nz + 1, -1)
        for s in range(S):
            sl = slice(s * nzl, (s + 1) * nzl + 1)
            b_loc[s] = bg[sl].reshape(-1)
            bc_loc[s] = mg[sl].reshape(-1)
            owned[s] = True
            if s > 0:
                owned[s, :nplane] = False  # bottom plane owned upstream

        if devices is None:
            devices = jax.devices()[:S]
        mesh_axis = Mesh(np.array(devices), ("shard",))
        return cls(dia=dia, bc_mask=jnp.asarray(bc_loc),
                   owned_mask=jnp.asarray(owned),
                   b_local=jnp.asarray(b_loc.astype(np.dtype(dtype))),
                   nplane=nplane, nzl=nzl, Nx=Nx, Ny=Ny, Nz=box.Nz,
                   mesh_axis=mesh_axis, rtol=rtol, kmax=kmax)

    # -- the jitted sharded solve ---------------------------------------------
    def _solver(self):
        nplane, nzl = self.nplane, self.nzl
        rtol, kmax = self.rtol, self.kmax
        top = nzl * nplane

        def shard_fn(weights, bc_mask, owned_mask, b):
            weights = [w[0] for w in weights]
            bc_mask, owned_mask, b = bc_mask[0], owned_mask[0], b[0]
            dia = DiaOperator(list(weights), bc_mask, self.dia.plan,
                              self.dia.layout, 1, self.dia.surr_dims)
            S = jax.lax.axis_size("shard")

            def action(x):
                y = dia.apply(x)  # slab stencil (partial rows at interfaces)
                # reverse halo: bottom plane partial sums -> owner above...
                ghost = y[:nplane]
                recv = jax.lax.ppermute(ghost, "shard",
                                        [(s, s - 1) for s in range(1, S)])
                y = y.at[top: top + nplane].add(recv)
                y = jnp.where(bc_mask, 0.0, y)
                # forward halo: owner's top plane -> downstream ghosts
                share = y[top: top + nplane]
                recv2 = jax.lax.ppermute(share, "shard",
                                         [(s, s + 1) for s in range(S - 1)])
                is_first = jax.lax.axis_index("shard") == 0
                new_bottom = jnp.where(is_first, y[:nplane], recv2)
                y = y.at[:nplane].set(new_bottom)
                return y

            def dot(u, v):
                t = jnp.float64 if (u.dtype == jnp.float32
                                    and jax.config.jax_enable_x64) else u.dtype
                local = jnp.sum(jnp.where(owned_mask,
                                          u.astype(t) * v.astype(t), 0.0))
                return jax.lax.psum(local, "shard")

            from tpufem.la.cg import cg_solve
            x, it, rel = cg_solve(action, b, rtol=rtol, maxit=kmax,
                                  dot_fn=dot)
            return x[None], it, rel

        nw = len(self.dia.weights)
        fn = jax.shard_map(
            shard_fn, mesh=self.mesh_axis,
            in_specs=((P("shard"),) * nw, P("shard"), P("shard"), P("shard")),
            out_specs=(P("shard"), P(), P()),
        )

        def run(dia_weights, bc, owned, b):
            return fn(tuple(dia_weights), bc, owned, b)

        return jax.jit(run)

    def _stacked_weights(self):
        if "w" not in self._cache:
            # identical slab weights on every shard, stacked on axis 0
            self._cache["w"] = [jnp.broadcast_to(w, (self.mesh_axis.size,) + w.shape)
                                for w in self.dia.weights]
        return self._cache["w"]

    def solve(self) -> Tuple[np.ndarray, int, float]:
        if "run" not in self._cache:
            self._cache["run"] = self._solver()
        x_loc, it, rel = self._cache["run"](
            self._stacked_weights(), self.bc_mask, self.owned_mask,
            self.b_local)
        jax.block_until_ready(x_loc)
        x = self.collect(np.asarray(x_loc))
        return x, int(it), float(rel)

    def solve_timed(self) -> Tuple[np.ndarray, int, float, float]:
        if "run" not in self._cache:
            self._cache["run"] = self._solver()
        run = self._cache["run"]
        args = (self._stacked_weights(), self.bc_mask, self.owned_mask)
        jax.block_until_ready(run(*args, self.b_local)[0])
        reps = 3
        t0 = time.perf_counter()
        outs = [run(*args, self.b_local * (1.0 + 1e-6 * (i + 1)))[0]
                for i in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        x_loc, it, rel = run(*args, self.b_local)
        x = self.collect(np.asarray(jax.block_until_ready(x_loc)))
        return x, int(it), float(rel), dt

    def collect(self, x_loc: np.ndarray) -> np.ndarray:
        """Global vector from per-shard slabs (owned planes)."""
        S = x_loc.shape[0]
        parts = [x_loc[0]]
        for s in range(1, S):
            parts.append(x_loc[s][self.nplane:])
        return np.concatenate(parts)
