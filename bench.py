"""Benchmark harness — run on real TPU hardware by the driver.

Reproduces the reference's recommended weak-scaling configuration shapes
(README.md:110-128: Poisson, 500k DOF/proc, CG rtol 1e-8 + AMG) plus the
matrix-free cgpoisson throughput metric (Gdof/s = iters * dofs / s / 1e9,
src/cgpoisson_problem.cpp:236-242), on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
   "extra": {...}}

The reference publishes no absolute numbers in-tree (BASELINE.md), so
vs_baseline is reported against the previous round's value when
BENCH_PREV.json exists, else 1.0.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpufem.config import enable_compilation_cache
    enable_compilation_cache()

    extra = {"backend": jax.default_backend(),
             "device": str(jax.devices()[0])}
    log(f"backend={extra['backend']} device={extra['device']}")
    # device/tunnel warm-up: the first computation pays a large, highly
    # variable session-init cost that must not pollute stage timings
    jax.block_until_ready(jnp.ones(8) + 1.0)
    log("device warm-up done")

    from tpufem.config import Config, SolverOptions
    from tpufem.mesh import BoxTetMesh
    from tpufem.mesh.structured import compute_box_size_structured
    from tpufem.problems import cgpoisson, poisson
    from tpufem.timing import REGISTRY

    # ---- 1. Poisson P1, 500k dofs, CG + geometric multigrid, rtol 1e-8 ----
    NDOFS = 500_000
    cfg = Config(problem_type="poisson", ndofs=NDOFS, scaling_type="strong",
                 dtype="float32",
                 solver=SolverOptions(pc_type="gmg", ksp_rtol=1e-8,
                                      ksp_max_it=100))
    nx, ny, nz, _lv = compute_box_size_structured(NDOFS, True, 1, 1, 1)
    mesh = BoxTetMesh(nx, ny, nz)

    # warm build: first-touch XLA compiles (RHS assembly program) land
    # here, NOT in the timed assemble — the reference's kernels are
    # AOT-compiled at build time (ffcx/C++), so including JIT compilation
    # in the assemble stage would not be apples-to-apples.  The warm
    # problem is discarded; the timed build below reuses every cached
    # executable.
    log(f"poisson P1: mesh {mesh.Nx}x{mesh.Ny}x{mesh.Nz}, warm build")
    with contextlib.redirect_stdout(sys.stderr):
        poisson.problem(mesh, 1, cfg)

    REGISTRY.reset()
    log("poisson P1: timed build")
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        prob = poisson.problem(mesh, 1, cfg)
    assemble_s = time.perf_counter() - t0
    for name, reps, tot in REGISTRY.rows():
        log(f"  stage {name}: {tot:.2f}s")
    log(f"assembled in {assemble_s:.2f}s; first solve (AMG setup + compile)")

    # first call = AMG setup + compile; second = pure solve
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        x, it = prob.solver_function(prob.u, prob.b)
        jax.block_until_ready(x)
    solve_first_s = time.perf_counter() - t0
    log(f"first solve {solve_first_s:.2f}s ({it} iters); timing cached solve")
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        x, it = prob.solver_function(prob.u, prob.b)
        jax.block_until_ready(x)
    solve_s = time.perf_counter() - t0
    log(f"solve {solve_s:.3f}s, {it} iterations")
    # single-dispatch wall time includes the TPU-tunnel round trip of this
    # environment (~25-30 ms/dispatch); amortize it by pipelining several
    # solves (each with a perturbed RHS so nothing can be deduplicated)
    REPS = 10
    solve_amortized_s = 1e30
    for _pass in range(2):  # two passes; the tunnel occasionally stalls
        t0 = time.perf_counter()
        outs = [prob.solver_function.solve_async(
            prob.u, prob.b * (1.0 + 1e-6 * (i + 1)))[0] for i in range(REPS)]
        jax.block_until_ready(outs)
        solve_amortized_s = min(solve_amortized_s,
                                (time.perf_counter() - t0) / REPS)
    log(f"solve amortized over {REPS}: {solve_amortized_s:.3f}s")
    solve_s = min(solve_s, solve_amortized_s)

    ndofs = prob.space.ndofs
    total_s = assemble_s + solve_s
    extra.update({
        "poisson_p1_ndofs": ndofs,
        "poisson_p1_assemble_s": round(assemble_s, 4),
        "poisson_p1_solve_s": round(solve_s, 4),
        "poisson_p1_solve_first_s": round(solve_first_s, 4),
        "poisson_p1_iterations": it,
        "poisson_p1_dofs_per_s": round(ndofs / total_s, 1),
    })

    # ---- 2. matrix-free cgpoisson P2, 500k dofs, Gdof/s --------------------
    cfg2 = Config(problem_type="cgpoisson", ndofs=NDOFS,
                  scaling_type="strong", dtype="float32",
                  solver=SolverOptions())
    nx, ny, nz, _lv = compute_box_size_structured(NDOFS, True, 1, 2, 1)
    mesh2 = BoxTetMesh(nx, ny, nz)
    log("cgpoisson P2: building problem")
    with contextlib.redirect_stdout(sys.stderr):
        prob2 = cgpoisson.problem(mesh2, 2, cfg2)
        x2, it2 = prob2.solver_function(prob2.u, prob2.b)
    log(f"cgpoisson P2 done: {getattr(cgpoisson.problem, '_last_gdofs', 0):.3f} Gdof/s")
    gdofs = getattr(cgpoisson.problem, "_last_gdofs", 0.0)
    extra.update({
        "cgpoisson_p2_ndofs": prob2.space.ndofs,
        "cgpoisson_p2_iterations": it2,
        "cgpoisson_p2_gdof_per_s": round(gdofs, 3),
        "cgpoisson_p2_solve_s": round(
            getattr(cgpoisson.problem, "_last_solve_s", 0.0), 4),
    })

    # ---- 3. matrix-free cgpoisson P1, 2M dofs (BASELINE.md config) --------
    nx, ny, nz, _lv = compute_box_size_structured(2_000_000, True, 1, 1, 1)
    mesh3 = BoxTetMesh(nx, ny, nz)
    log("cgpoisson P1 2M: building problem")
    with contextlib.redirect_stdout(sys.stderr):
        cfg3 = Config(problem_type="cgpoisson", ndofs=2_000_000,
                      scaling_type="strong", dtype="float32",
                      solver=SolverOptions())
        prob3 = cgpoisson.problem(mesh3, 1, cfg3)
        x3, it3 = prob3.solver_function(prob3.u, prob3.b)
    gdofs3 = getattr(cgpoisson.problem, "_last_gdofs", 0.0)
    log(f"cgpoisson P1 2M done: {gdofs3:.3f} Gdof/s")
    extra.update({
        "cgpoisson_p1_2m_ndofs": prob3.space.ndofs,
        "cgpoisson_p1_2m_gdof_per_s": round(gdofs3, 3),
    })

    # ---- 4. elasticity P1, 500k dofs, CG + GMG, rtol 1e-8 ------------------
    from tpufem.problems import elasticity
    cfg4 = Config(problem_type="elasticity", ndofs=NDOFS,
                  scaling_type="strong", dtype="float32",
                  solver=SolverOptions(pc_type="gmg", ksp_rtol=1e-8,
                                       ksp_max_it=100))
    nx, ny, nz, _lv = compute_box_size_structured(NDOFS, True, 3, 1, 1)
    mesh4 = BoxTetMesh(nx, ny, nz)
    log(f"elasticity P1: mesh {nx}x{ny}x{nz}, warm build")
    with contextlib.redirect_stdout(sys.stderr):
        elasticity.problem(mesh4, 1, cfg4)
    log("elasticity P1: timed build")
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        prob4 = elasticity.problem(mesh4, 1, cfg4)
    assemble4_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        x4, it4 = prob4.solver_function(prob4.u, prob4.b)
        jax.block_until_ready(x4)
    first4_s = time.perf_counter() - t0
    solve4_s = 1e30
    for _pass in range(2):  # two passes; the tunnel occasionally stalls
        t0 = time.perf_counter()
        outs = [prob4.solver_function.solve_async(
            prob4.u, prob4.b * (1.0 + 1e-6 * (i + 1)))[0] for i in range(REPS)]
        jax.block_until_ready(outs)
        solve4_s = min(solve4_s, (time.perf_counter() - t0) / REPS)
    log(f"elasticity P1 500k: assemble {assemble4_s:.2f}s, first solve "
        f"{first4_s:.1f}s, solve {solve4_s:.3f}s, {it4} iterations")
    extra.update({
        "elasticity_p1_ndofs": prob4.space.ndofs,
        "elasticity_p1_assemble_s": round(assemble4_s, 4),
        "elasticity_p1_solve_s": round(solve4_s, 4),
        "elasticity_p1_iterations": it4,
        "elasticity_p1_dofs_per_s": round(
            prob4.space.ndofs / (assemble4_s + solve4_s), 1),
    })

    # ---- 5. SA-AMG at scale: AMG-forced cube Poisson, ~216k dofs -----------
    cfg5 = Config(problem_type="poisson", ndofs=216_000,
                  scaling_type="strong", dtype="float32",
                  solver=SolverOptions(pc_type="amg", ksp_rtol=1e-8,
                                       ksp_max_it=100))
    mesh5 = BoxTetMesh(60, 60, 60)
    log("poisson + SA-AMG 226k: warm build")
    with contextlib.redirect_stdout(sys.stderr):
        poisson.problem(mesh5, 1, cfg5)
    log("poisson + SA-AMG 226k: timed build")
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        prob5 = poisson.problem(mesh5, 1, cfg5)
    assemble5_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sys.stderr):
        x5, it5 = prob5.solver_function(prob5.u, prob5.b)  # AMG setup+compile
        jax.block_until_ready(x5)
    setup5_s = time.perf_counter() - t0
    solve5_s = 1e30
    for _pass in range(2):
        t0 = time.perf_counter()
        outs = [prob5.solver_function.solve_async(
            prob5.u, prob5.b * (1.0 + 1e-6 * (i + 1)))[0] for i in range(REPS)]
        jax.block_until_ready(outs)
        solve5_s = min(solve5_s, (time.perf_counter() - t0) / REPS)
    log(f"SA-AMG 226k: assemble {assemble5_s:.2f}s, setup+compile "
        f"{setup5_s:.1f}s, solve {solve5_s:.3f}s, {it5} iterations")
    extra.update({
        "poisson_amg_ndofs": prob5.space.ndofs,
        "poisson_amg_assemble_s": round(assemble5_s, 4),
        "poisson_amg_setup_first_s": round(setup5_s, 4),
        "poisson_amg_solve_s": round(solve5_s, 4),
        "poisson_amg_iterations": it5,
    })

    value = round(ndofs / total_s, 1)
    vs = 1.0
    if os.path.exists("BENCH_PREV.json"):
        try:
            prev = json.load(open("BENCH_PREV.json"))
            if "value" not in prev and "parsed" in prev:
                prev = prev["parsed"]  # driver BENCH_r{N}.json wrapper
            if prev.get("value"):
                vs = round(value / float(prev["value"]), 3)
        except Exception:
            pass

    print(json.dumps({
        "metric": "poisson_p1_500k_assemble_solve_dofs_per_s",
        "value": value,
        "unit": "dof/s",
        "vs_baseline": vs,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
