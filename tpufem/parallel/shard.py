"""Sharded (SPMD) problem execution over a JAX device mesh.

The TPU-native replacement for the reference's MPI domain decomposition
(1 MPI rank <-> 1 chip/shard): the cube lattice is block-split into
z-slabs (no graph partitioner needed — SURVEY.md E2), each shard
materializes its slab's cells, and the solver runs under ``shard_map``
with halo exchange as ppermute shifts and reductions as psum
(reference comm pattern: src/cgpoisson_problem.cpp:209-230, src/cg.h).

The whole CG loop — operator action, ghost exchange, dots — is ONE
jitted program; XLA overlaps the ppermute traffic with element compute.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpufem.fem import kernels
from tpufem.fem.space import FunctionSpace
from tpufem.mesh import BoxTetMesh
from tpufem.parallel.indexmap import (ShardIndexMaps, build_index_maps,
                                      masked_dot, scatter_fwd,
                                      scatter_rev_add)


from tpufem.fem.assemble import metric_np as _metric_np


def slab_ranges(nz: int, nshards: int) -> list:
    """Balanced contiguous z-layer ranges (the lattice block partition)."""
    if nz < nshards:
        raise ValueError(f"Nz={nz} < shards={nshards}; refine the base mesh")
    bounds = np.linspace(0, nz, nshards + 1).astype(np.int64)
    return [(int(bounds[s]), int(bounds[s + 1])) for s in range(nshards)]


@dataclasses.dataclass
class ShardedPoissonCG:
    """Sharded matrix-free Poisson CG (the cgpoisson flagship path)."""

    imaps: ShardIndexMaps
    data: dict                  # stacked [S, ...] device arrays
    b_local: jnp.ndarray        # [S, nlocal]
    order: int
    ndofs: int
    mesh_axis: Mesh
    rtol: float
    kmax: int

    @classmethod
    def build(cls, box: BoxTetMesh, order: int, nshards: int,
              dtype=jnp.float32, rtol: float = 1e-6, kmax: int = 100,
              devices=None, b_global: np.ndarray = None,
              bc_dofs: np.ndarray = None) -> "ShardedPoissonCG":
        from tpufem.fem.dirichlet import DirichletBC
        from tpufem.problems import common

        if b_global is None or bc_dofs is None:
            # host-global RHS/BC setup (the partitioner-analogue phase)
            space_g = FunctionSpace(box, order)
            facets = box.locate_boundary_facets(common.poisson_bc_marker)
            bc = DirichletBC.from_space(space_g, facets)
            bc_dofs = bc.flat_dofs()
            if b_global is None:
                from tpufem.problems.poisson import assemble_poisson_rhs_np
                b_global = assemble_poisson_rhs_np(space_g)
                b_global[bc_dofs] = 0.0  # cgpoisson convention (b[bc]=0)
            ndofs = space_g.ndofs_scalar
        else:
            ndofs = b_global.shape[0]

        ranges = slab_ranges(box.Nz, nshards)
        slabs = [BoxTetMesh(box.Nx, box.Ny, box.Nz, z_lo=a, z_hi=b)
                 for a, b in ranges]
        spaces = [FunctionSpace(m, order) for m in slabs]
        cell_dofs = [s.cell_dofs for s in spaces]
        imaps = build_index_maps(cell_dofs)

        S = nshards
        n = spaces[0].ndofs_per_cell
        Cmax = max(cd.shape[0] for cd in cell_dofs)
        G = np.zeros((S, Cmax, 3, 3), dtype=np.dtype(dtype))
        cd_local = np.zeros((S, Cmax, n), dtype=np.int32)
        perm = np.zeros((S, Cmax * n), dtype=np.int32)
        seg = np.zeros((S, Cmax * n), dtype=np.int32)
        bc_mask = np.zeros((S, imaps.nlocal), dtype=bool)
        bc_set = set(bc_dofs.tolist())

        for s in range(S):
            C = cell_dofs[s].shape[0]
            G[s, :C] = _metric_np(slabs[s].cell_coords())
            loc = imaps.local_of_global(s, cell_dofs[s].reshape(-1))
            cd_local[s, :C] = loc.reshape(C, n).astype(np.int32)
            flat = np.zeros(Cmax * n, dtype=np.int64)
            flat[: C * n] = loc
            p = np.argsort(flat, kind="stable")
            perm[s] = p.astype(np.int32)
            seg[s] = flat[p].astype(np.int32)
            present = np.isin(imaps.local_gids[s], bc_dofs)
            # only real slots (padding slots map to gid 0 which may or may
            # not be a bc dof — mask against validity)
            valid = np.zeros(imaps.nlocal, dtype=bool)
            valid[: imaps.owned_counts[s]] = True
            valid[imaps.max_owned: imaps.max_owned + imaps.ghost_counts[s]] = True
            bc_mask[s] = present & valid

        data = dict(
            G=jnp.asarray(G),
            cd=jnp.asarray(cd_local),
            perm=jnp.asarray(perm),
            seg=jnp.asarray(seg),
            bc_mask=jnp.asarray(bc_mask),
            owned_mask=jnp.asarray(imaps.owned_mask),
            ghost_mask=jnp.asarray(imaps.ghost_mask),
            share_idx=jnp.asarray(imaps.share_idx.astype(np.int32)),
            share_mask=jnp.asarray(imaps.share_mask),
        )
        b_local = jnp.asarray(imaps.distribute(b_global).astype(np.dtype(dtype)))

        if devices is None:
            devices = jax.devices()[:S]
        mesh_axis = Mesh(np.array(devices), ("shard",))
        return cls(imaps=imaps, data=data, b_local=b_local, order=order,
                   ndofs=ndofs, mesh_axis=mesh_axis, rtol=rtol, kmax=kmax)

    # -- the jitted sharded solve ---------------------------------------------
    def _solver(self):
        order = self.order
        max_owned = self.imaps.max_owned
        nlocal = self.imaps.nlocal
        rtol, kmax = self.rtol, self.kmax

        def shard_fn(G, cd, perm, seg, bc_mask, owned_mask, ghost_mask,
                     share_idx, share_mask, b):
            # shard_map passes [1, ...] blocks for a 1-d mesh; drop axis 0
            (G, cd, perm, seg, bc_mask, owned_mask, ghost_mask, share_idx,
             share_mask, b) = jax.tree.map(
                 lambda a: a[0], (G, cd, perm, seg, bc_mask, owned_mask,
                                  ghost_mask, share_idx, share_mask, b))

            def action(x):
                u_cells = x[cd]
                y_cells = kernels.poisson_action_from_metric(G, u_cells, order)
                y = jax.ops.segment_sum(y_cells.reshape(-1)[perm], seg,
                                        num_segments=nlocal,
                                        indices_are_sorted=True)
                y = jnp.where(bc_mask, 0.0, y)
                y = scatter_rev_add(y, share_idx, share_mask, max_owned)
                y = jnp.where(bc_mask, 0.0, y)
                y = scatter_fwd(y, share_idx, share_mask, ghost_mask, max_owned)
                return y

            from tpufem.la.cg import cg_solve
            dot_fn = functools.partial(masked_dot, owned_mask=owned_mask)
            x, it, rel = cg_solve(action, b, rtol=rtol, maxit=kmax,
                                  dot_fn=lambda a, c: dot_fn(a, c))
            return x[None], it, rel

        fn = jax.shard_map(
            shard_fn, mesh=self.mesh_axis,
            in_specs=(P("shard"),) * 10,
            out_specs=(P("shard"), P(), P()),
        )
        return jax.jit(lambda data, b: fn(
            data["G"], data["cd"], data["perm"], data["seg"], data["bc_mask"],
            data["owned_mask"], data["ghost_mask"], data["share_idx"],
            data["share_mask"], b))

    def solve(self) -> Tuple[np.ndarray, int, float]:
        run = self._solver()
        x_local, it, rel = run(self.data, self.b_local)
        jax.block_until_ready(x_local)
        x = self.imaps.collect(np.asarray(x_local), self.ndofs)
        return x, int(it), float(rel)

    def solve_timed(self) -> Tuple[np.ndarray, int, float, float]:
        """Warm-up compile, then timed run (Gdof/s metric wants pure
        iteration throughput, reference cgpoisson_problem.cpp:236-242)."""
        import time
        run = self._solver()
        jax.block_until_ready(run(self.data, self.b_local))
        t0 = time.perf_counter()
        x_local, it, rel = run(self.data, self.b_local)
        jax.block_until_ready(x_local)
        dt = time.perf_counter() - t0
        x = self.imaps.collect(np.asarray(x_local), self.ndofs)
        return x, int(it), float(rel), dt
