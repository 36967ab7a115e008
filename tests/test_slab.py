"""Slab-sharded distributed solver vs the single-device solve.

The reference's correctness signal for parallel runs is that iteration
counts and norms match the serial solve (ccpp.yml runs the same configs
at -np 1 and -np 2).  Here the sharded GMG hierarchy is mathematically
identical to the single-device one, so iteration counts must be EQUAL
and solutions must agree to rounding.  Runs on the virtual 8-device CPU
mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufem.fem.dia_op import build_operator
from tpufem.fem.dirichlet import DirichletBC
from tpufem.fem.space import FunctionSpace
from tpufem.la.cg import cg_solve
from tpufem.la.gmg import GMG
from tpufem.mesh import BoxTetMesh
from tpufem.parallel.slab import ShardedCubeSolver, _default_rhs
from tpufem.problems import common


def _single_device(mesh, problem, rtol=1e-8, maxit=60, precond=True,
                   order=1):
    bs = 3 if problem == "elasticity" else 1
    marker = (common.elasticity_bc_marker if problem == "elasticity"
              else common.poisson_bc_marker)
    space = FunctionSpace(mesh, order, bs=bs)
    bc = DirichletBC.from_space(space, mesh.locate_boundary_facets(marker))
    A = build_operator(mesh, order, problem, bc_dofs=bc.flat_dofs(),
                       dtype=jnp.float64)
    b = _default_rhs(mesh, problem, bs, order)
    b[bc.flat_dofs()] = 0.0
    b = jnp.asarray(b)
    if precond:
        pc = GMG.setup(mesh, order, problem, marker, dtype=jnp.float64,
                       coarse_limit=1000)
        run = jax.jit(lambda A, pc, b: cg_solve(
            A.apply, b, precond=pc.vcycle, rtol=rtol, maxit=maxit))
        x, it, rel = run(A, pc, b)
    else:
        run = jax.jit(lambda A, b: cg_solve(A.apply, b, rtol=rtol,
                                            maxit=maxit))
        x, it, rel = run(A, b)
    return np.asarray(x), int(it), float(rel)


@pytest.mark.parametrize("dims,S,problem,expect_K", [
    ((8, 8, 16), 4, "poisson", 1),
    ((16, 16, 32), 4, "poisson", 2),      # two sharded levels + suffix
    ((8, 8, 16), 2, "elasticity", 1),     # bs=3 blocked path
    ((12, 12, 24), 6, "poisson", 1),      # non-power-of-two shards
])
def test_sharded_gmg_matches_single_device(dims, S, problem, expect_K):
    mesh = BoxTetMesh(*dims)
    sh = ShardedCubeSolver.build(mesh, S, problem=problem,
                                 dtype=jnp.float64, rtol=1e-8, maxit=60,
                                 gather_limit=500)
    assert len(sh.levels) == expect_K
    xs, its, rels = sh.solve()
    x1, it1, rel1 = _single_device(mesh, problem)
    assert its == it1
    assert rels < 1e-8
    err = np.abs(xs - x1).max() / np.abs(x1).max()
    assert err < 1e-10


@pytest.mark.parametrize("dims,S,order", [
    ((8, 8, 16), 4, 2), ((10, 8, 12), 2, 2), ((8, 8, 16), 2, 3)])
def test_sharded_pk_gmg_matches_single_device(dims, S, order):
    """Distributed P2/P3 cube GMG (p-transfer level sharded over
    z-slabs) must match the single-device order-k GMG exactly —
    iteration counts EQUAL, solutions to rounding.  Reference runs
    order 3 on 2 ranks in CI (ccpp.yml:86-101)."""
    mesh = BoxTetMesh(*dims)
    sh = ShardedCubeSolver.build(mesh, S, problem="poisson", order=order,
                                 dtype=jnp.float64, rtol=1e-8, maxit=60,
                                 gather_limit=500)
    assert sh.levels[0].order == order and sh.levels[1].order == 1
    # interface plan covers vertex + in-plane edge kinds (+ in-plane
    # face kinds for P3): every dof kind whose grid spans the z planes
    assert len(sh.levels[0].iface) == {2: 4, 3: 6}[order]
    xs, its, rels = sh.solve()
    x1, it1, rel1 = _single_device(mesh, "poisson", order=order)
    assert its == it1
    assert rels < 1e-8
    err = np.abs(xs - x1).max() / np.abs(x1).max()
    assert err < 1e-10


def test_sharded_p2_unpreconditioned_cg():
    """Sharded matrix-free P2 (the cgpoisson convention) on slabs."""
    mesh = BoxTetMesh(6, 6, 8)
    sh = ShardedCubeSolver.build(mesh, 4, problem="poisson", order=2,
                                 dtype=jnp.float64, rtol=1e-6, maxit=400,
                                 precond=False)
    xs, its, rels = sh.solve()
    x1, it1, rel1 = _single_device(mesh, "poisson", rtol=1e-6, maxit=400,
                                   precond=False, order=2)
    assert abs(its - it1) <= 1
    assert rels < 1e-6
    err = np.abs(xs - x1).max() / np.abs(x1).max()
    assert err < 1e-8


def test_sharded_unpreconditioned_cg():
    """precond=False is the cgpoisson matrix-free convention."""
    mesh = BoxTetMesh(8, 8, 16)
    sh = ShardedCubeSolver.build(mesh, 4, problem="poisson",
                                 dtype=jnp.float64, rtol=1e-6, maxit=200,
                                 precond=False)
    xs, its, rels = sh.solve()
    x1, it1, rel1 = _single_device(mesh, "poisson", rtol=1e-6, maxit=200,
                                   precond=False)
    assert abs(its - it1) <= 1  # unpreconditioned CG: reduction-order fp
    assert rels < 1e-6
    err = np.abs(xs - x1).max() / np.abs(x1).max()
    assert err < 1e-8


def test_sharded_pk_elasticity_matches_single_device():
    """Sharded P2 elasticity (bs=3 + p-coarsening on slabs) — the last
    configuration that used to fall back to rowshard — must match the
    single-device GMG exactly."""
    mesh = BoxTetMesh(8, 8, 16)
    sh = ShardedCubeSolver.build(mesh, 2, problem="elasticity", order=2,
                                 dtype=jnp.float64, rtol=1e-8, maxit=60,
                                 gather_limit=500)
    assert sh.levels[0].order == 2 and sh.levels[1].order == 1
    xs, its, rels = sh.solve()
    x1, it1, rel1 = _single_device(mesh, "elasticity", order=2)
    assert its == it1
    assert rels < 1e-8
    err = np.abs(xs - x1).max() / np.abs(x1).max()
    assert err < 1e-10


def test_sharded_rejects_bad_shapes():
    from tpufem.parallel.slab import slab_gmg_viable
    with pytest.raises(ValueError, match="not divisible"):
        ShardedCubeSolver.build(BoxTetMesh(8, 8, 10), 4)
    # the CLI's routing predicate mirrors build()'s preconditions
    assert slab_gmg_viable(BoxTetMesh(8, 8, 16), 4)
    assert not slab_gmg_viable(BoxTetMesh(8, 8, 10), 4)   # Nz % S != 0
    assert not slab_gmg_viable(BoxTetMesh(8, 8, 8), 4)    # odd slabs
    assert not slab_gmg_viable(BoxTetMesh(4, 4, 8), 2,
                               coarse_limit=1000)         # no chain
