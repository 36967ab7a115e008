"""Slab-sharded SPMD solver for the structured cube path — the
distributed product path behind ``--num_shards``.

Rebuild of the reference's MPI execution model (every rank owns a mesh
partition, PETSc/Hypre solve across ranks; src/main.cpp:118-233) as an
SPMD program over a 1-D ``jax.sharding.Mesh``:

- **decomposition**: z-slabs of vertex planes.  Shard s holds planes
  [s*nzl, (s+1)*nzl]; the bottom plane is a ghost owned by shard s-1
  (the IndexMap owned/ghost split of the reference's dolfinx backend).
  All shards carry identical static shapes — one compiled program.
- **operator apply**: local slab stencil (partial rows at the interface
  planes — the non-overlapping element partition the reference's
  assembler uses) -> reverse halo: ONE ``ppermute`` carries the
  bottom-plane partial sums to their owner and accumulates
  (scatter_rev(plus), poisson_problem.cpp:154) -> BC rows zeroed ->
  forward halo: ONE ``ppermute`` refreshes the downstream ghosts
  (scatter_fwd, cgpoisson_problem.cpp:224-229).
- **distributed geometric multigrid**: every V-cycle ingredient keeps
  the slab structure.  Restriction accumulates each shard's OWNED fine
  planes only; the contributions that cross the interface ride the same
  reverse halo as the operator apply.  Prolongation is halo-free: every
  local fine plane depends only on coarse planes already in the slab
  (ghosts fresh by invariant).  Once a level is small enough its slabs
  are ``all_gather``-ed and the remaining hierarchy runs REPLICATED on
  every shard (redundant compute on O(N / 8^k) dofs beats communicating
  it) via the single-device GMG — the same level chain, Chebyshev
  interval, and coarse dense inverse as the unsharded solver, so
  iteration counts match the single-device run exactly.
- **reductions**: owned-masked dots under ``psum``
  (the MPI_Allreduce of cg.h:61).

Everything — CG, V-cycle, halos, gathers — runs inside ONE jitted
``shard_map`` program; XLA overlaps the collectives with compute.

BC semantics: rows-zero with b[bc] = 0.  Every Krylov/multigrid vector
vanishes on the BC dofs, so the iterates are identical to CG on the
BC-eliminated (unit-diagonal) operator the single-device assembled path
uses — iteration counts are directly comparable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpufem.fem.dia_op import DiaOperator
from tpufem.la.cg import cg_solve
from tpufem.la.chebyshev import chebyshev_smoother
from tpufem.la.gmg import GMG, prolong_h, restrict_h, surrogate_lmax
from tpufem.mesh.structured import BoxTetMesh


def _level_chain(mesh: BoxTetMesh, bs: int, coarse_limit: int,
                 max_levels: int) -> List[Tuple[int, int, int]]:
    """Dyadic level dims, finest first — the SAME walk as GMG.setup
    (gmg.py) so the sharded and single-device hierarchies coincide."""
    chain = [(mesh.Nx, mesh.Ny, mesh.Nz)]
    while True:
        nx, ny, nz = chain[-1]
        ndofs_here = (nx + 1) * (ny + 1) * (nz + 1) * bs
        if (ndofs_here <= coarse_limit or len(chain) >= max_levels
                or nx % 2 or ny % 2 or nz % 2 or min(nx, ny, nz) < 4):
            break
        chain.append((nx // 2, ny // 2, nz // 2))
    return chain


def _slab_stack(planes: np.ndarray, S: int, nzl: int) -> np.ndarray:
    """[Z+1, m] plane-major global array -> [S, (nzl+1)*m] overlapping
    z-slabs (plane s*nzl is shard s's ghost and shard s-1's top)."""
    return np.stack([planes[s * nzl: (s + 1) * nzl + 1].reshape(-1)
                     for s in range(S)])


def _global_diag_planes(d_slab: np.ndarray, S: int, nzl: int) -> np.ndarray:
    """Global operator diagonal (plane-major [Z+1, m]) from ONE slab
    operator's diagonal [nzl+1, m]: interface planes sum the two partial
    diagonals; interior planes repeat the slab pattern (the raw stencil
    diagonal is z-translation-invariant away from the global ends)."""
    m = d_slab.shape[1]
    Zp = S * nzl + 1
    g = np.empty((Zp, m), dtype=d_slab.dtype)
    g[0] = d_slab[0]
    g[-1] = d_slab[nzl]
    for s in range(S):
        g[s * nzl + 1: (s + 1) * nzl] = d_slab[1:nzl]
    if S > 1:
        g[nzl:-1:nzl] = d_slab[0] + d_slab[nzl]
    return g


@dataclasses.dataclass
class _Level:
    """Host-side build product for one sharded level."""

    op: DiaOperator        # slab operator (unbaked BC; weights replicated)
    dinv: np.ndarray       # [S, nloc] global-diagonal inverse slabs
    bc: np.ndarray         # [S, nloc] bool
    dims: Tuple[int, int, int]   # global (Nx, Ny, Nz) of this level
    nzl: int               # cube layers per shard
    lmax: float


@dataclasses.dataclass
class ShardedCubeSolver:
    """Distributed CG (optionally GMG-preconditioned) on BoxTetMesh for
    problem in {"poisson", "elasticity"} (P1; scalar and bs=3)."""

    levels: List[_Level]
    suffix: Optional[GMG]         # replicated coarse hierarchy (None when
    #                               unpreconditioned)
    b_local: jnp.ndarray          # [S, nloc]
    owned: jnp.ndarray            # [S, nloc]
    bs: int
    S: int
    mesh_axis: Mesh
    rtol: float
    maxit: int
    smoother_degree: int
    _cache: dict = dataclasses.field(default_factory=dict)

    # -- construction ---------------------------------------------------------
    @classmethod
    def build(cls, mesh: BoxTetMesh, nshards: int, problem: str = "poisson",
              order: int = 1, dtype=jnp.float32, rtol: float = 1e-8,
              maxit: int = 100, precond: bool = True,
              coarse_limit: int = 1000, smoother_degree: int = 2,
              max_levels: int = 12, gather_limit: int = 100_000,
              devices=None, b_global: Optional[np.ndarray] = None,
              ) -> "ShardedCubeSolver":
        if order != 1:
            raise NotImplementedError(
                "sharded cube path is P1 (order-1); higher orders run "
                "single-device")
        from tpufem.fem.dirichlet import DirichletBC
        from tpufem.fem.space import FunctionSpace
        from tpufem.problems import common

        bs = 3 if problem == "elasticity" else 1
        marker = (common.elasticity_bc_marker if problem == "elasticity"
                  else common.poisson_bc_marker)
        S = nshards
        if mesh.Nz % S:
            raise ValueError(
                f"Nz={mesh.Nz} not divisible by {S} shards "
                "(compute_box_size_structured(num_shards=...) guarantees "
                "this for CLI meshes)")

        chain = _level_chain(mesh, bs, coarse_limit, max_levels)
        if precond:
            # sharded prefix: levels whose z extent splits into equal
            # even slabs; the first level at/below gather_limit dofs
            # switches to the replicated suffix
            K = 0
            while (K + 1 < len(chain)
                   and chain[K][2] % S == 0 and (chain[K][2] // S) % 2 == 0
                   and (K == 0  # the finest level always shards
                        or (chain[K][0] + 1) * (chain[K][1] + 1)
                           * (chain[K][2] + 1) * bs > gather_limit)):
                K += 1
            if K == 0:
                raise ValueError(
                    f"cannot shard {mesh.Nx}x{mesh.Ny}x{mesh.Nz} over {S} "
                    f"slabs with multigrid (Nz/S={mesh.Nz // S} must be "
                    "even); increase the mesh or lower the shard count")
            lmax = surrogate_lmax(mesh, 1, problem, marker, dtype)
        else:
            K = 1
            lmax = 1.0

        def level_bc_planes(nx, ny, nz):
            lmesh = BoxTetMesh(nx, ny, nz)
            lspace = FunctionSpace(lmesh, 1, bs=bs)
            lbc = DirichletBC.from_space(
                lspace, lmesh.locate_boundary_facets(marker))
            mask = np.zeros(lspace.ndofs, dtype=bool)
            mask[lbc.flat_dofs()] = True
            return lbc, mask.reshape(nz + 1, (nx + 1) * (ny + 1) * bs)

        levels: List[_Level] = []
        fine_bc = None
        for i in range(K):
            nx, ny, nz = chain[i]
            nzl = nz // S
            slab = BoxTetMesh(nx, ny, nzl)
            op = DiaOperator.build(slab, 1, problem, dtype=dtype,
                                   h_override=(1.0 / nx, 1.0 / ny, 1.0 / nz),
                                   bake_bc=False)
            m = (nx + 1) * (ny + 1) * bs
            d_slab = op.diagonal_np().reshape(nzl + 1, m)
            dinv = 1.0 / _global_diag_planes(d_slab, S, nzl)
            lbc, bc_planes = level_bc_planes(nx, ny, nz)
            if i == 0:
                fine_bc = lbc
            levels.append(_Level(
                op=op,
                dinv=_slab_stack(dinv, S, nzl).astype(np.dtype(dtype)),
                bc=_slab_stack(bc_planes, S, nzl),
                dims=(nx, ny, nz), nzl=nzl, lmax=lmax))

        suffix = None
        if precond:
            suffix = GMG.setup(BoxTetMesh(*chain[K]), 1, problem, marker,
                               dtype=dtype, coarse_limit=coarse_limit,
                               smoother_degree=smoother_degree,
                               max_levels=max_levels - K)

        # RHS + owned masks on the finest level
        nx, ny, nz = chain[0]
        nzl0 = nz // S
        m0 = (nx + 1) * (ny + 1) * bs
        if b_global is None:
            b_global = _default_rhs(mesh, problem, bs)
        bg = np.asarray(b_global, dtype=np.float64).copy()
        bg[fine_bc.flat_dofs()] = 0.0
        b_local = _slab_stack(bg.reshape(nz + 1, m0), S, nzl0)
        owned = np.ones((S, (nzl0 + 1) * m0), dtype=bool)
        owned[1:, :m0] = False

        if devices is None:
            devices = jax.devices()
        if len(devices) < S:
            raise ValueError(f"need {S} devices, have {len(devices)}")
        mesh_axis = Mesh(np.array(devices[:S]), ("shard",))
        return cls(levels=levels, suffix=suffix,
                   b_local=jnp.asarray(b_local.astype(np.dtype(dtype))),
                   owned=jnp.asarray(owned), bs=bs, S=S,
                   mesh_axis=mesh_axis, rtol=rtol, maxit=maxit,
                   smoother_degree=smoother_degree)

    # -- the jitted SPMD program ------------------------------------------------
    def _build_program(self):
        S = self.S
        bs = self.bs
        rtol, maxit = self.rtol, self.maxit
        degree = self.smoother_degree
        # static per-level metadata (closed over; only arrays are args)
        meta = [(lv.dims, lv.nzl, lv.lmax) for lv in self.levels]
        K = len(self.levels)
        preconditioned = self.suffix is not None
        suffix_bc_static = (preconditioned and not self.suffix.levels)
        down = [(s, s - 1) for s in range(1, S)]
        up = [(s, s + 1) for s in range(S - 1)]
        npl = [(dims[0] + 1) * (dims[1] + 1) * bs for (dims, *_r) in meta]
        top = [nzl * n for (_d, nzl, *_r), n in zip(meta, npl)]

        def shard_fn(ops, ldinv, lbc, owned, b, suffix):
            # ops: per-level slab DiaOperators, passed through shard_map
            # as replicated pytrees (every shard runs the same slab
            # stencil; only the diagonal/BC/rhs slabs are sharded)
            ldinv = [d[0] for d in ldinv]
            lbc = [m[0] for m in lbc]
            owned = owned[0]
            b = b[0]

            def halo_rev(y, n, t):
                """Bottom-plane partial sums -> owner above, accumulate."""
                recv = jax.lax.ppermute(y[:n], "shard", down)
                return y.at[t: t + n].add(recv)

            def halo_fwd(y, n, t):
                """Owner's top plane -> downstream ghosts."""
                recv = jax.lax.ppermute(y[t: t + n], "shard", up)
                is_first = jax.lax.axis_index("shard") == 0
                return y.at[:n].set(jnp.where(is_first, y[:n], recv))

            def action(i, x):
                y = ops[i].apply(x)
                y = halo_rev(y, npl[i], top[i])
                y = jnp.where(lbc[i], 0.0, y)
                return halo_fwd(y, npl[i], top[i])

            def grid(i, v, coarse=False):
                (nx, ny, _nz), nzl = meta[i][0], meta[i][1]
                if coarse:
                    nx, ny, nzl = nx // 2, ny // 2, nzl // 2
                shape = (nzl + 1, ny + 1, nx + 1) + ((bs,) if bs > 1 else ())
                return v.reshape(shape)

            def suffix_bc0():
                return (suffix.coarse_bc_mask if suffix_bc_static
                        else suffix.levels[0].op.bc_mask)

            def vcycle(i, r):
                smooth = chebyshev_smoother(lambda v: action(i, v),
                                            ldinv[i], meta[i][2],
                                            degree=degree)
                x = smooth(jnp.zeros_like(r), r)
                rr = r - action(i, x)
                rr = jnp.where(lbc[i], 0.0, rr)
                # restrict OWNED fine planes only (ghost plane zeroed);
                # interface contributions ride the reverse halo
                g = grid(i, rr)
                is_first = jax.lax.axis_index("shard") == 0
                g = g.at[0].set(jnp.where(is_first, g[0], 0.0))
                rc = restrict_h(g, None).reshape(-1)
                if i + 1 < K:
                    rc = halo_rev(rc, npl[i + 1], top[i + 1])
                    rc = jnp.where(lbc[i + 1], 0.0, rc)
                    rc = halo_fwd(rc, npl[i + 1], top[i + 1])
                    ec = vcycle(i + 1, rc)
                else:
                    # gather the coarse slabs; run the replicated suffix
                    (nx, ny, _nz), nzl = meta[i][0], meta[i][1]
                    cm = (nx // 2 + 1) * (ny // 2 + 1) * bs
                    ctop = (nzl // 2) * cm
                    recv = jax.lax.ppermute(rc[:cm], "shard", down)
                    rc = rc.at[ctop: ctop + cm].add(recv)
                    ag = jax.lax.all_gather(rc, "shard")  # [S, nloc_c]
                    glob = jnp.concatenate([ag[0], ag[1:, cm:].reshape(-1)])
                    glob = jnp.where(suffix_bc0(), 0.0, glob)
                    eg = suffix.vcycle(glob)
                    eg = jnp.where(suffix_bc0(), 0.0, eg)
                    k = jax.lax.axis_index("shard")
                    ec = jax.lax.dynamic_slice(eg, (k * ctop,),
                                               ((nzl // 2 + 1) * cm,))
                e = prolong_h(grid(i, ec, coarse=True), None).reshape(-1)
                e = jnp.where(lbc[i], 0.0, e)
                return smooth(x + e, r)

            def dot(u, v):
                t = (jnp.float64 if (u.dtype == jnp.float32
                                     and jax.config.jax_enable_x64)
                     else u.dtype)
                local = jnp.sum(jnp.where(owned,
                                          u.astype(t) * v.astype(t), 0.0))
                return jax.lax.psum(local, "shard")

            M = (lambda r: vcycle(0, r)) if preconditioned else None
            x, it, rel = cg_solve(lambda v: action(0, v), b,
                                  precond=M, rtol=rtol, maxit=maxit,
                                  dot_fn=dot)
            return x[None], it, rel

        ops_arg = tuple(lv.op for lv in self.levels)
        ops_specs = jax.tree.map(lambda _: P(), ops_arg)
        fn = jax.shard_map(
            shard_fn, mesh=self.mesh_axis,
            in_specs=(ops_specs, (P("shard"),) * K, (P("shard"),) * K,
                      P("shard"), P("shard"), P()),
            out_specs=(P("shard"), P(), P()),
        )
        return jax.jit(fn)

    def _run(self, b):
        if "run" not in self._cache:
            self._cache["args"] = (
                tuple(lv.op for lv in self.levels),
                tuple(jnp.asarray(lv.dinv) for lv in self.levels),
                tuple(jnp.asarray(lv.bc) for lv in self.levels))
            # AOT compile: hits the persistent compilation cache; the
            # dispatch-path compiler does not (see tpufem.aot)
            self._cache["run"] = self._build_program().lower(
                *self._cache["args"], self.owned, b, self.suffix).compile()
        ops, ldinv, lbc = self._cache["args"]
        return self._cache["run"](ops, ldinv, lbc, self.owned, b, self.suffix)

    # -- public API -------------------------------------------------------------
    def solve(self) -> Tuple[np.ndarray, int, float]:
        x_loc, it, rel = self._run(self.b_local)
        jax.block_until_ready(x_loc)
        return self.collect(np.asarray(x_loc)), int(it), float(rel)

    def solve_timed(self, reps: int = 3) -> Tuple[np.ndarray, int, float, float]:
        """(x, iterations, rel, seconds); dispatch round-trip amortized
        over ``reps`` perturbed solves (TPU-tunnel latency)."""
        jax.block_until_ready(self._run(self.b_local)[0])
        t0 = time.perf_counter()
        outs = [self._run(self.b_local * (1.0 + 1e-6 * (i + 1)))[0]
                for i in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        x_loc, it, rel = self._run(self.b_local)
        x = self.collect(np.asarray(jax.block_until_ready(x_loc)))
        return x, int(it), float(rel), dt

    def collect(self, x_loc: np.ndarray) -> np.ndarray:
        """Global dof vector from the per-shard slabs (drop ghosts)."""
        (nx, ny, _nz) = self.levels[0].dims
        m = (nx + 1) * (ny + 1) * self.bs
        parts = [x_loc[0]]
        for s in range(1, self.S):
            parts.append(x_loc[s][m:])
        return np.concatenate(parts)


def _default_rhs(mesh: BoxTetMesh, problem: str, bs: int) -> np.ndarray:
    """Host f64 RHS for the benchmark problems (one-time setup)."""
    from tpufem.fem.space import FunctionSpace
    space = FunctionSpace(mesh, 1, bs=bs)
    if problem == "elasticity":
        from tpufem.problems.elasticity import assemble_elasticity_rhs_np
        return assemble_elasticity_rhs_np(space)
    from tpufem.problems.poisson import assemble_poisson_rhs_np
    return assemble_poisson_rhs_np(space)
