"""Assembled-matrix Poisson problem.

Rebuild of ``poisson::problem`` (reference: src/poisson_problem.cpp:31-182):
P1-P3 GLL-warped Lagrange space; Dirichlet u=0 on x0 in {0,1}; RHS
f = Gaussian bump (volume) + g = sin(5 x0) (surface); assembled stiffness
with BC rows/cols zeroed + unit diagonal; solver closure = from-scratch
CG with Jacobi or SA-AMG preconditioning (replacing PETSc KSP + Hypre
BoomerAMG, README.md:110-128).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import Config
from tpufem.fem import kernels
from tpufem.fem.assemble import DofScatter, assemble_operator
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.la.cg import cg_solve
from tpufem.problems import common
from tpufem.timing import Timer


def assemble_poisson_rhs(space: FunctionSpace, scatter: DofScatter,
                         dtype) -> jnp.ndarray:
    """b_i = int f v dx + int g v ds over the whole exterior boundary
    (form L, src/Poisson.py:32)."""
    mesh = space.mesh
    order = space.order
    f = space.interpolate(common.poisson_f)
    g = space.interpolate(common.poisson_g)

    coords = jnp.asarray(mesh.cell_coords(), dtype=dtype)
    cd = space.cell_dofs
    f_cells = jnp.asarray(f[cd], dtype=dtype)
    b_cells = kernels.poisson_rhs_cells(coords, f_cells, order)
    b = scatter.scatter_add(b_cells)

    facets = mesh.boundary_faces()
    cells, lf = common.facet_to_cell(mesh.cell_faces(), facets)
    fc_coords = jnp.asarray(mesh.cell_coords()[cells], dtype=dtype)
    g_cells = jnp.asarray(g[cd[cells]], dtype=dtype)
    contrib = kernels.facet_rhs_cells(fc_coords, jnp.asarray(lf), g_cells, order)
    # scatter facet contributions (cell-local layout) to dofs
    flat = cd[cells].reshape(-1)
    b = b.at[jnp.asarray(flat)].add(contrib.reshape(-1))
    return b


def assemble_poisson_rhs_np(space: FunctionSpace) -> np.ndarray:
    """Host float64 twin of assemble_poisson_rhs (setup-phase use, e.g.
    building the sharded RHS without device f64)."""
    from tpufem.fem.assemble import _geometry_np
    mesh = space.mesh
    el = space.element
    f = space.interpolate(common.poisson_f)
    g = space.interpolate(common.poisson_g)
    cd = space.cell_dofs
    coords = mesh.cell_coords()
    _, adet = _geometry_np(coords)
    b_cells = (f[cd] @ el.mass_tensor.T) * adet[:, None]
    b = np.bincount(cd.reshape(-1), weights=b_cells.reshape(-1),
                    minlength=space.ndofs_scalar)

    facets = mesh.boundary_faces()
    cells, lf = common.facet_to_cell(mesh.cell_faces(), facets)
    from tpufem.mesh.structured import LOCAL_FACES
    tri_idx = LOCAL_FACES[lf]
    tri = np.take_along_axis(coords[cells], tri_idx[:, :, None], axis=1)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    S = el.facet_mass_tensors[lf]  # [F, n, n]
    contrib = np.einsum("fij,fj->fi", S, g[cd[cells]]) * area2[:, None]
    b += np.bincount(cd[cells].reshape(-1), weights=contrib.reshape(-1),
                     minlength=space.ndofs_scalar)
    return b


def problem(mesh, order: int, cfg: Config) -> common.Problem:
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

    with Timer("ZZZ FunctionSpace"):
        space = FunctionSpace(mesh, order)
        _ = space.cell_dofs

    with Timer("ZZZ Create boundary conditions"):
        facets = mesh.locate_boundary_facets(common.poisson_bc_marker)
        bc = DirichletBC.from_space(space, facets)

    with Timer("ZZZ Create RHS function"):
        scatter = DofScatter(space.cell_dofs, space.ndofs_scalar)

    with Timer("ZZZ Assemble matrix"):
        A, _csr = assemble_operator(space, bc, "poisson", dtype=np.dtype(dtype))

    with Timer("ZZZ Assemble vector"):
        b = assemble_poisson_rhs(space, scatter, dtype)
        # apply_lifting is numerically zero (u0 = 0); set BC values
        b = jnp.asarray(bc.set(b))
        b.block_until_ready()

    u = jnp.zeros(space.ndofs, dtype=dtype)

    solver = cfg.solver

    rtol = float(solver.get("ksp_rtol"))
    maxit = int(solver.get("ksp_max_it"))
    cache = {}

    def solver_function(u0: jnp.ndarray, rhs: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        # preconditioner setup happens inside the solve (matching PETSc,
        # where PCSetUp runs within KSPSolve / "ZZZ Solve"); cached for
        # repeat solves
        pc_type = solver.get("pc_type")
        if "run" not in cache:
            if pc_type == "amg":
                from tpufem.la.amg import SAAMG
                pc = SAAMG.setup(_csr, bs=1, options=solver, dtype=dtype,
                                 bc_mask=bc.mask())
                precond_of = lambda pc: pc.vcycle
            elif pc_type == "jacobi":
                pc = 1.0 / A.diagonal()
                precond_of = lambda dinv: (lambda r: dinv * r)
            else:
                pc = None
                precond_of = lambda _: None

            @jax.jit
            def run(A, pc, x0, rhs):
                return cg_solve(A.matvec, rhs, x0=x0, precond=precond_of(pc),
                                rtol=rtol, maxit=maxit)

            cache["run"], cache["pc"] = run, pc
        x, it, rel = cache["run"](A, cache["pc"], u0, rhs)
        return x, int(it)

    return common.Problem(b=b, u=u, solver_function=solver_function,
                          space=space, bc=bc)
