"""Vector-valued (bs=3) linear elasticity problem.

Rebuild of ``elastic::problem`` (reference: src/elasticity_problem.cpp):
P1-P3 vector Lagrange space; clamped y=0 face; rotational body force;
blocked (3x3) assembled stiffness; rigid-body near-nullspace attached to
the solver (the MatSetNearNullSpace analogue) feeding the SA-AMG
tentative prolongator — replacing PETSc GAMG (README.md:63-82).
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
from tpufem.la.nullspace import build_near_nullspace
from tpufem.problems import common
from tpufem.timing import Timer


def assemble_elasticity_rhs(space: FunctionSpace, scatter: DofScatter,
                            dtype) -> jnp.ndarray:
    """b = int f . v dx (form L, src/Elasticity.py:40)."""
    f = space.interpolate(common.elasticity_f)  # flat [3 * ns]
    coords = jnp.asarray(space.mesh.cell_coords(), dtype=dtype)
    cd = space.cell_dofs
    f_cells = jnp.asarray(f.reshape(-1, 3)[cd], dtype=dtype)  # [C, n, 3]
    b_cells = kernels.elasticity_rhs_cells(coords, f_cells, space.order)
    return scatter.scatter_add(b_cells)


def problem(mesh, order: int, cfg: Config) -> common.Problem:
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

    with Timer("ZZZ FunctionSpace"):
        space = FunctionSpace(mesh, order, bs=3)
        _ = space.cell_dofs

    with Timer("ZZZ Create boundary conditions"):
        facets = mesh.locate_boundary_facets(common.elasticity_bc_marker)
        bc = DirichletBC.from_space(space, facets)

    with Timer("ZZZ Create RHS function"):
        scatter = DofScatter(space.cell_dofs, space.ndofs_scalar, bs=3)

    with Timer("ZZZ Assemble matrix"):
        A, _csr = assemble_operator(space, bc, "elasticity",
                                    dtype=np.dtype(dtype))

    with Timer("ZZZ Assemble vector"):
        b = assemble_elasticity_rhs(space, scatter, dtype)
        b = jnp.asarray(bc.set(b))
        b.block_until_ready()

    with Timer("ZZZ Create near-nullspace"):
        nns = build_near_nullspace(space.scalar_dof_coords())

    u = jnp.zeros(space.ndofs, dtype=dtype)
    solver = cfg.solver

    rtol = float(solver.get("ksp_rtol"))
    maxit = int(solver.get("ksp_max_it"))
    cache = {}

    def solver_function(u0: jnp.ndarray, rhs: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        # PC setup inside the solve (PETSc's PCSetUp runs within
        # KSPSolve), cached for repeat solves
        pc_type = solver.get("pc_type")
        if "run" not in cache:
            if pc_type == "amg":
                from tpufem.la.amg import SAAMG
                pc = SAAMG.setup(_csr, bs=3, options=solver, dtype=dtype,
                                 near_nullspace=nns, bc_mask=bc.mask())
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
