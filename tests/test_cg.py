"""CG solver variants: the fused Chronopoulos-Gear form must reproduce
the classic three-term loop (same Krylov trajectory in exact
arithmetic; reference hot loop src/cg.h:38-86)."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from tpufem.la.cg import cg_solve, cg_solve_fused


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(1.0, 50.0, n)
    return (Q * lam) @ Q.T


def test_fused_matches_classic():
    n = 120
    A = jnp.asarray(_spd(n))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    mv = lambda v: A @ v
    x1, it1, rel1 = cg_solve(mv, b, rtol=1e-10, maxit=400)
    x2, it2, rel2 = cg_solve_fused(mv, b, rtol=1e-10, maxit=400)
    assert abs(int(it1) - int(it2)) <= 1
    assert float(rel2) < 1e-10
    err = np.abs(np.asarray(x1 - x2)).max() / np.abs(np.asarray(x1)).max()
    assert err < 1e-8


def test_fused_maxit_and_x0():
    n = 80
    A = jnp.asarray(_spd(n, 2))
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    mv = lambda v: A @ v
    x, it, rel = cg_solve_fused(mv, b, rtol=1e-30, maxit=7)
    assert int(it) == 7
    # x0 semantics match the classic solver (criterion stays relative
    # to the INITIAL residual, src/cg.h:78)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal(n))
    x1, it1, _ = cg_solve(mv, b, x0=x0, rtol=1e-9, maxit=400)
    x2, it2, _ = cg_solve_fused(mv, b, x0=x0, rtol=1e-9, maxit=400)
    assert abs(int(it1) - int(it2)) <= 1
    err = np.abs(np.asarray(x1 - x2)).max() / np.abs(np.asarray(x1)).max()
    assert err < 1e-7
