"""Matrix-free CG Poisson problem (the performance-critical custom path).

Rebuild of ``cgpoisson::problem`` (reference: src/cgpoisson_problem.cpp):
no assembled matrix — the operator action is the UFL form
M = action(a, un) (src/Poisson.py:33).  The reference re-packs
coefficients and re-assembles the action form in every CG iteration
(cgpoisson_problem.cpp:193-230, with explicit pack -> MPI scatter ->
unpack ghost exchange); the TPU-native design precomputes the per-cell
metric once and runs the whole CG loop in one jitted ``lax.while_loop``,
gather -> two MXU matmuls + metric contraction -> sorted segment-sum.

Reports the reference's throughput metric:
Gdof/s = iterations * global_dofs / solve_seconds / 1e9
(cgpoisson_problem.cpp:236-242); CG kmax=100, rtol=1e-6.
"""

from __future__ import annotations

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.config import Config
from tpufem.fem import kernels
from tpufem.fem.assemble import DofScatter
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.la.cg import cg_solve
from tpufem.problems import common
from tpufem.problems.poisson import assemble_poisson_rhs
from tpufem.timing import Timer


import dataclasses


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MatFreePoissonOp:
    """The matrix-free operator as a pytree (passed into jit as data):
    precomputed per-cell metric, dofmap, BC dofs, scatter tables."""

    G: jnp.ndarray          # [C, 3, 3] |detJ| Jinv Jinv^T
    cd: jnp.ndarray         # [C, n] int32 cell dofs
    bc_flat: jnp.ndarray    # [nbc] int32 constrained dofs
    scatter: DofScatter
    order: int              # static

    def tree_flatten(self):
        return (self.G, self.cd, self.bc_flat, self.scatter), self.order

    @classmethod
    def tree_unflatten(cls, order, children):
        return cls(*children, order)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x with BC rows zeroed (matching bc->set(y, 0) at
        cgpoisson_problem.cpp:207)."""
        u_cells = x[self.cd]
        y_cells = kernels.poisson_action_from_metric(self.G, u_cells, self.order)
        y = self.scatter.scatter_add(y_cells)
        return y.at[self.bc_flat].set(0.0)


def make_action(space: FunctionSpace, bc: DirichletBC, scatter: DofScatter,
                dtype) -> MatFreePoissonOp:
    # per-cell metric computed on host in f64 (exact, no device-f64
    # emulation), shipped to the device in the solve dtype
    from tpufem.fem.assemble import metric_np
    G_np = metric_np(space.mesh.cell_coords())
    G = jnp.asarray(G_np.astype(np.dtype(dtype)))
    cd = jnp.asarray(space.cell_dofs.astype(np.int32))
    bc_flat = jnp.asarray(bc.flat_dofs().astype(np.int32))
    return MatFreePoissonOp(G, cd, bc_flat, scatter, space.order)


def problem(mesh, order: int, cfg: Config) -> common.Problem:
    dtype = common.resolve_dtype(cfg)
    from tpufem.mesh.structured import BoxTetMesh
    structured = isinstance(mesh, BoxTetMesh)

    with Timer("ZZZ FunctionSpace"):
        space = FunctionSpace(mesh, order)
        if not structured:
            _ = space.cell_dofs

    with Timer("ZZZ Create boundary conditions"):
        facets = mesh.locate_boundary_facets(common.poisson_bc_marker)
        bc = DirichletBC.from_space(space, facets)

    with Timer("ZZZ Assemble vector"):
        # matrix-free lifting: un = -u0 on BC dofs, assemble M into b
        # (cgpoisson_problem.cpp:159-162); u0 = 0 so it vanishes here.
        # BC dofs of b zeroed (zeroes the columns of A;
        # cgpoisson_problem.cpp:168)
        if structured and dtype == jnp.float32:
            from tpufem.problems.poisson import \
                assemble_poisson_rhs_structured_dev
            b = assemble_poisson_rhs_structured_dev(space, bc, dtype)
        else:
            from tpufem.problems.poisson import assemble_poisson_rhs_np
            b_np = assemble_poisson_rhs_np(space)
            b_np[bc.flat_dofs()] = 0.0
            b = jnp.asarray(b_np.astype(np.dtype(dtype)))

    u = jnp.zeros(space.ndofs, dtype=dtype)
    from tpufem.mesh.structured import BoxTetMesh
    if isinstance(mesh, BoxTetMesh):
        # constant-stencil matrix-free action: zero gather/scatter
        # (the TPU-fast path; ~150x the throughput of gather+segment_sum).
        # All orders use the DIA (shift-diagonal) form where the lattice
        # permits, with BC elimination BAKED into the weights (zeroed
        # rows/cols + unit diagonal): with b[bc] = 0 the Krylov
        # trajectory on the BC-zero subspace is identical to the
        # reference's rows-zero convention (cgpoisson_problem.cpp:207)
        # — y[bc] = 1.0 * x[bc] keeps the constrained entries exactly
        # zero — and the apply needs no separate mask pass (one fewer
        # full-vector HBM pass per iteration).  Tiny lattices fall back
        # to per-perm element matmuls with the explicit rows-zero mask.
        from tpufem.fem.dia_op import DiaOperator, build_operator
        op = build_operator(mesh, order, "poisson", bc_dofs=bc.flat_dofs(),
                            dtype=dtype, bake_bc=True)
        baked = isinstance(op, DiaOperator) and op.is_const()
        if not baked:
            op = build_operator(mesh, order, "poisson",
                                bc_dofs=bc.flat_dofs(), dtype=dtype,
                                bake_bc=False)
        if (order >= 2 and isinstance(op, DiaOperator) and op.is_const()
                and cfg.solver.extra.get("use_conv")):
            # OPT-IN (-use_conv 1): the same const-table matrix as an MXU
            # channel convolution (fem/conv_op.py) — bulk 3x3x3 conv over
            # C typed-dof channels + O(surface) boundary contractions.
            # Its HLO is far smaller (27 dense ops vs ~1300 shifted
            # slices), but on v5e hardware the conv APPLY is ~6x slower
            # than the fused-slice VPU form (in-loop fori measurements at
            # ~510k dofs: P2 0.65 vs 4.30 ms, P3 1.14 vs 6.95 ms — XLA
            # lowers the C-channel conv through im2col-style copies that
            # the shifted-slice form never materializes), so the DIA form
            # is the default and conv remains the compile-size escape
            # hatch.
            from tpufem.fem.conv_op import ConvStencilOp
            try:
                op = ConvStencilOp.from_dia(op, dtype=dtype)
            except ValueError:
                pass
        if "use_conv" in cfg.solver.extra:
            cfg.solver._consumed.add("use_conv")
        if (order >= 2 and baked and isinstance(op, DiaOperator)
                and op.is_const() and cfg.solver.extra.get("use_flat")):
            # OPT-IN (-use_flat 1): channel-plane layout with the interior
            # as one Pallas MXU matmul per plane pair (fem/flat_op.py).
            # Measured SLOWER than the fused-slice DIA apply on v5e
            # (P2 594 vs ~160 us, P3 1123 vs ~830 us per apply at 510-517k
            # dofs) — kept as the tested foundation for a fused-corrections
            # kernel; see the flat_op module header for the breakdown.
            from tpufem.fem.flat_op import FlatOperator
            fop = FlatOperator.from_dia(op)
            if fop is not None:
                op = fop
            else:
                import logging
                logging.getLogger("tpufem").warning(
                    "use_flat ignored: operator structure does not fit "
                    "(non-unit shifts, tiny grid, or bs > 1)")
        if "use_flat" in cfg.solver.extra:
            cfg.solver._consumed.add("use_flat")
        if (order >= 2 and baked and isinstance(op, DiaOperator)
                and op.is_const()
                and int(cfg.solver.extra.get("use_strip", 1))):
            # DEFAULT for P2/P3 (-use_strip 0 restores the DIA form):
            # channel-strip layout (fem/strip_op.py) — the DIA zone
            # apply on full 128-lane vregs, with a VMEM-resident Pallas
            # kernel on TPU when the buffers fit.  Production CLI at
            # ~510-517k dofs on v5e: P3 4.66 vs 0.62 Gdof/s, P2 7.16
            # vs 2.98 (XLA-twin strip without the kernel: P3 0.86,
            # P2 2.88).
            from tpufem.fem.strip_op import StripOperator
            sop = StripOperator.from_dia(op, dtype=dtype)
            if sop is not None:
                op = sop
        if "use_strip" in cfg.solver.extra:
            cfg.solver._consumed.add("use_strip")
        if order == 1 and cfg.solver.extra.get("use_pallas"):
            # fused single-pass stencil kernel (opt-in; the default
            # XLA table apply fuses to the same single pass and
            # benchmarks faster on this hardware — the kernel remains
            # for comparison; see fem/pallas_stencil.py)
            cfg.solver._consumed.add("use_pallas")
            from tpufem.fem.pallas_stencil import PallasStencilOp
            try:
                op = PallasStencilOp.from_dia(build_operator(
                    mesh, order, "poisson", bc_dofs=bc.flat_dofs(),
                    dtype=dtype, bake_bc=False))
                baked = False
            except ValueError:
                import logging
                logging.getLogger("tpufem").warning(
                    "use_pallas ignored: operator is not const-mode "
                    "P1 (lattice below 6 cubes/axis)")
        apply_of = ((lambda o: o.apply) if baked
                    else (lambda o: o.apply_bc_rows_zero))
    else:
        scatter = DofScatter(space.cell_dofs, space.ndofs_scalar)
        op = make_action(space, bc, scatter, dtype)
        apply_of = lambda o: o.apply
    solver = cfg.solver
    rtol = float(solver.extra.get("cg_rtol", 1e-6))
    kmax = int(solver.extra.get("cg_kmax", 100))
    solver._consumed.update(("cg_rtol", "cg_kmax"))

    cache = {}

    def run(op_, x0, rhs_):
        return (cache["run"] if "run" in cache else _compile(op_, x0, rhs_))(
            op_, x0, rhs_)

    def _compile(op_, x0, rhs_):
        # AOT compile: hits the persistent compilation cache; the
        # dispatch-path compiler does not (see tpufem.aot)
        from tpufem.aot import compile_aot
        from tpufem.fem.conv_op import ConvStencilOp
        from tpufem.la.cg import cg_solve_fused

        # zero initial guess (the reference's un starts at 0 with BC
        # values already lifted into b): no operator application
        # outside the while_loop at all
        from tpufem.fem.flat_op import FlatOperator
        from tpufem.fem.strip_op import StripOperator
        if isinstance(op_, StripOperator):
            use_ck = str(solver.extra.get("cg_kernel", "off"))
            solver._consumed.add("cg_kernel")
            if use_ck == "on" and op_.cg_kernel_ok \
                    and jax.default_backend() == "tpu":
                # WHOLE-CG VMEM-resident Pallas kernel — OPT-IN, demoted
                # with data (VERDICT r5 #6): at P3 150k (the largest
                # size whose residency fits the ~14 MB VMEM budget) the
                # two forms are within tunnel measurement noise of each
                # other with no reliable winner (three paired runs:
                # split 1.88/2.25/1.70 vs resident 1.49/1.73/2.06
                # Gdof/s).  Zero HBM state streams per iteration buys
                # nothing decisive at sizes this small: the kernel's
                # three full-state reductions and 732 single-row delta
                # RMWs per iteration serialize on the VPU, and frozen
                # post-convergence iterations (masked fori_loop) add
                # dead work the split form's while_loop skips.  No
                # demonstrated win -> the simpler split form stays the
                # default; -cg_kernel on enables it and the bench row
                # records both regimes every round.
                def run_ck(o, x, r):
                    r_f = o.to_strips(r)
                    x_f, it, rel = o.cg_pallas(r_f, rtol, kmax)
                    return o.from_strips(x_f, dtype=r.dtype), it, rel
                cache["run"] = compile_aot(run_ck, op_, x0, rhs_)
                cache["cg_kernel"] = True
                return cache["run"]
            # channel-resident loop: strip<->dof relayout pays once per
            # solve; pad/guard lanes stay exactly zero through the
            # iteration so buffer dots equal dof dots (tested)
            def run_st(o, x, r):
                r_f = o.to_strips(r)
                x_f, it, rel = cg_solve_fused(o.apply_strips, r_f, x0=None,
                                              rtol=rtol, maxit=kmax)
                return o.from_strips(x_f, dtype=r.dtype), it, rel
            cache["run"] = compile_aot(run_st, op_, x0, rhs_)
        elif isinstance(op_, FlatOperator):
            # channel-resident loop: flat<->channel relayout pays once
            # per solve; dots over the zero-padded plane buffer equal
            # dofwise dots (padding/guard lanes stay exactly zero)
            def run_fl(o, x, r):
                r_f = o.to_flat(r)
                x_f, it, rel = cg_solve_fused(o.apply_flat, r_f, x0=None,
                                              rtol=rtol, maxit=kmax)
                return o.from_flat(x_f).astype(r.dtype), it, rel
            cache["run"] = compile_aot(run_fl, op_, x0, rhs_)
        elif isinstance(op_, ConvStencilOp) and baked:
            # channel-resident loop: the flat<->channel relayout pays
            # once per SOLVE, not per iteration (conv_op.apply_channels)
            def run_ch(o, x, r):
                r_ch = o.to_channels_padded(r)
                x_ch, it, rel = cg_solve_fused(o.apply_channels, r_ch,
                                               x0=None, rtol=rtol,
                                               maxit=kmax)
                return o.from_channels_padded(x_ch), it, rel
            cache["run"] = compile_aot(run_ch, op_, x0, rhs_)
        else:
            cache["run"] = compile_aot(
                lambda o, x, r: cg_solve_fused(apply_of(o), r, x0=None,
                                               rtol=rtol, maxit=kmax),
                op_, x0, rhs_)
        return cache["run"]

    def solver_function(u0: jnp.ndarray, rhs: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        # warm-up compile outside the timed region (the reference's C++
        # kernels are AOT-compiled; timing XLA compilation would not be
        # an apples-to-apples solve time); this is also the RETURNED
        # solve — the timing reps below use perturbed RHS
        out0 = run(op, u0, rhs)
        jax.block_until_ready(out0)
        # pipeline several perturbed solves so per-dispatch transport
        # latency (~25-30 ms through the TPU tunnel) amortizes out;
        # completion barrier = SCALAR READBACK of the last output
        # (block_until_ready can return early through the tunnel;
        # dispatches run in order on the one device stream) and min
        # over passes discards congestion outliers
        reps = 10
        dt = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run(op, u0, rhs * (1.0 + 1e-6 * (i + 1)))
                    for i in range(reps)]
            float(jnp.ravel(outs[-1][0])[-1])
            dt = min(dt, (time.perf_counter() - t0) / reps)
        x, it, rel = out0
        gdofs = int(it) * space.ndofs / dt / 1e9
        print(f"CG matrix-free action processed: {gdofs} Gdof/s", flush=True)
        problem._last_gdofs = gdofs
        problem._last_solve_s = dt
        # which loop ran: True only when the VMEM-resident whole-CG
        # kernel was engaged (bench must not mislabel a split-form
        # fallback as the resident regime)
        problem._last_cg_kernel = bool(cache.get("cg_kernel", False))
        return x, int(it)

    return common.Problem(b=b, u=u, solver_function=solver_function,
                          space=space, bc=bc)
