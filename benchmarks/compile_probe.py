"""Measure cold-compile + solve wall time of the P1 GMG solve on TPU.

Usage: python benchmarks/compile_probe.py [--no-cache] [--ndofs N]
Reports: build time, first-solve wall (compile + run), warm solve.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.perf_counter()


def log(m):
    print(f"[probe +{time.perf_counter() - t0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--ndofs", type=int, default=500_000)
    ap.add_argument("--problem", default="poisson")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if not args.no_cache:
        from tpufem.config import enable_compilation_cache
        enable_compilation_cache()
    jax.block_until_ready(jnp.ones(8) + 1.0)
    log(f"warmup done, backend={jax.default_backend()}")

    from tpufem.config import Config, SolverOptions
    from tpufem.mesh import BoxTetMesh
    from tpufem.mesh.structured import compute_box_size_structured
    from tpufem.problems import elasticity, poisson

    mod = elasticity if args.problem == "elasticity" else poisson
    dpn = 3 if args.problem == "elasticity" else 1
    cfg = Config(problem_type=args.problem, ndofs=args.ndofs,
                 scaling_type="strong", dtype="float32",
                 solver=SolverOptions(pc_type="gmg", ksp_rtol=1e-8,
                                      ksp_max_it=100))
    nx, ny, nz, _ = compute_box_size_structured(args.ndofs, True, dpn, 1, 1)
    mesh = BoxTetMesh(nx, ny, nz)
    log(f"mesh {nx}x{ny}x{nz}")
    tb = time.perf_counter()
    prob = mod.problem(mesh, 1, cfg)
    log(f"build {time.perf_counter() - tb:.2f}s; first solve...")
    tb = time.perf_counter()
    x, it = prob.solver_function(prob.u, prob.b)
    jax.block_until_ready(x)
    first = time.perf_counter() - tb
    log(f"first solve {first:.2f}s ({it} iters)")
    tb = time.perf_counter()
    x, it = prob.solver_function(prob.u, prob.b)
    float(jnp.ravel(x)[-1])
    log(f"warm solve {time.perf_counter() - tb:.3f}s")


if __name__ == "__main__":
    main()
