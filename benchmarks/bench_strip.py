"""Microbench: P2/P3 operator apply — const-DIA vs channel-strip form.

Run on the real TPU chip (default backend).  Measures barriered
in-loop apply chains (y <- scale * A y inside one jitted fori_loop, so
per-dispatch tunnel latency amortizes out), reporting us/apply.

    python benchmarks/bench_strip.py [--orders 2,3] [--ndofs 510000]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", default="2,3")
    ap.add_argument("--ndofs", type=int, default=510_000)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpufem.fem.dia_op import DiaOperator
    from tpufem.fem.strip_op import StripOperator
    from tpufem.fem.dirichlet import DirichletBC
    from tpufem.fem.space import FunctionSpace
    from tpufem.mesh.structured import BoxTetMesh
    from tpufem.mesh.structured import compute_box_size_structured
    from tpufem.problems import common

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    R = args.reps

    def timed(fn, x):
        f = jax.jit(fn)
        y = f(x)
        jax.block_until_ready(y)
        float(jnp.ravel(y)[-1])
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(x)
            float(jnp.ravel(y)[-1])
            best = min(best, time.perf_counter() - t0)
        return best / R * 1e6  # us/apply

    for order in (int(o) for o in args.orders.split(",")):
        nx, ny, nz, _ = compute_box_size_structured(args.ndofs, True,
                                                    1, order, 1)
        mesh = BoxTetMesh(nx, ny, nz)
        space = FunctionSpace(mesh, order)
        facets = mesh.locate_boundary_facets(common.poisson_bc_marker)
        bc = DirichletBC.from_space(space, facets)
        dia = DiaOperator.try_const(mesh, order, "poisson",
                                    bc_dofs=bc.flat_dofs(),
                                    dtype=jnp.float32)
        strip = StripOperator.from_dia(dia, dtype=jnp.float32)
        n = space.ndofs
        print(f"P{order}: mesh {nx}x{ny}x{nz}, ndofs {n}", file=sys.stderr)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        scale = np.float32(0.05)

        def chain(apply):
            def go(x):
                return jax.lax.fori_loop(
                    0, R, lambda i, y: apply(y) * scale, x)
            return go

        t_dia = timed(chain(dia.apply), u)
        uf = strip.to_strips(u)
        t_strip = timed(chain(strip.apply_strips), uf)
        print(f"P{order} ndofs={n}: dia {t_dia:.1f} us/apply, "
              f"strip {t_strip:.1f} us/apply ({t_dia / t_strip:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
