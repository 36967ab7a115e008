"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(the reference's analogue: mpirun -np 2 smoke runs, ccpp.yml:71-85).
Sharded solves must match single-device solves to solver tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufem.mesh import BoxTetMesh
from tpufem.parallel.indexmap import build_index_maps
from tpufem.parallel.shard import ShardedPoissonCG, slab_ranges
from tpufem.fem.space import FunctionSpace


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_index_maps_cover_and_partition():
    box = BoxTetMesh(4, 4, 8)
    slabs = [BoxTetMesh(4, 4, 8, z_lo=a, z_hi=b) for a, b in slab_ranges(8, 4)]
    cds = [FunctionSpace(m, 2).cell_dofs for m in slabs]
    im = build_index_maps(cds)
    ndofs = FunctionSpace(box, 2).ndofs_scalar
    # owned sets partition [0, ndofs)
    all_owned = np.concatenate([im.local_gids[s, :im.owned_counts[s]]
                                for s in range(4)])
    assert np.array_equal(np.sort(all_owned), np.arange(ndofs))
    # ghosts of shard s are owned by s-1 and listed in s-1's share list
    for s in range(1, 4):
        ng = im.ghost_counts[s]
        gh = im.local_gids[s, im.max_owned: im.max_owned + ng]
        prev_share = im.local_gids[s - 1][im.share_idx[s - 1, :ng]]
        assert np.array_equal(gh, prev_share)


@pytest.mark.parametrize("order,nshards", [(1, 8), (2, 4), (3, 2)])
def test_sharded_matches_single_device(order, nshards):
    box = BoxTetMesh(6, 5, 8)
    sh = ShardedPoissonCG.build(box, order, nshards, dtype=jnp.float64,
                                rtol=1e-10, kmax=800)
    x_sh, it_sh, rel = sh.solve()
    assert rel < 1e-10

    single = ShardedPoissonCG.build(box, order, 1, dtype=jnp.float64,
                                    rtol=1e-10, kmax=800)
    x_1, it_1, _ = single.solve()
    assert np.allclose(x_sh, x_1, atol=1e-8)
    # iteration counts must agree (bitwise-tolerant, SURVEY.md step 7)
    assert abs(it_sh - it_1) <= 2


def test_sharded_matches_problem_module():
    """Cross-check against the single-device cgpoisson problem path."""
    from tpufem.config import Config, SolverOptions
    from tpufem.problems import cgpoisson

    box = BoxTetMesh(4, 4, 8)
    cfg = Config(problem_type="cgpoisson", dtype="float64",
                 solver=SolverOptions())
    cfg.solver.extra.update(cg_rtol=1e-11, cg_kmax=1000)
    prob = cgpoisson.problem(box, 1, cfg)
    x_ref, _ = prob.solver_function(prob.u, prob.b)

    sh = ShardedPoissonCG.build(box, 1, 8, dtype=jnp.float64,
                                rtol=1e-11, kmax=1000)
    x_sh, it, rel = sh.solve()
    assert np.allclose(x_sh, np.asarray(x_ref), atol=1e-8)


