"""Conjugate-gradient solver, jitted with ``lax.while_loop``.

From-scratch replacement for PETSc KSP CG (reference solver setup:
src/poisson_problem.cpp:164-179, README.md:72 ``-ksp_type cg -ksp_rtol
1.0e-8``) and generalization of the hand-written matrix-free CG
(src/cg.h:38-86: kmax, rtol on ||r||/||r0||, allreduce dots).

``action`` and ``precond`` are traceable functions; under sharding they
close over halo exchanges and psum reductions, so this single driver
serves both the single-chip and the SPMD paths.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpufem.la.vector import dot


def cg_solve(action: Callable[[jnp.ndarray], jnp.ndarray],
             b: jnp.ndarray,
             x0: Optional[jnp.ndarray] = None,
             precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
             rtol: float = 1e-8,
             maxit: int = 100,
             dot_fn: Callable = dot,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve A x = b.  Returns (x, iterations, ||r||/||r0||).

    Convergence: ||r||_2 / ||r0||_2 < rtol on the recurrence residual,
    matching src/cg.h:78 (which compares squared norms against rtol^2).
    With a preconditioner this is still the *unpreconditioned* norm, so
    iteration counts are directly comparable across preconditioners.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    M = precond if precond is not None else (lambda v: v)

    r = b - action(x)
    z = M(r)
    p = z
    rz = dot_fn(r, z)
    rnorm0 = dot_fn(r, r)

    def cond(state):
        x, r, z, p, rz, rnorm, k = state
        return jnp.logical_and(k < maxit, rnorm > rtol * rtol * rnorm0)

    def body(state):
        x, r, z, p, rz, rnorm, k = state
        y = action(p)
        alpha = (rz / dot_fn(p, y)).astype(b.dtype)
        x = x + alpha * p
        r = r - alpha * y
        z = M(r)
        rz_new = dot_fn(r, z)
        beta = (rz_new / rz).astype(b.dtype)
        p = z + beta * p
        rnorm = dot_fn(r, r)
        return (x, r, z, p, rz_new, rnorm, k + 1)

    state = (x, r, z, p, rz, rnorm0, jnp.asarray(0, dtype=jnp.int32))
    x, r, z, p, rz, rnorm, k = jax.lax.while_loop(cond, body, state)
    rel = jnp.sqrt(rnorm / rnorm0)
    return x, k, rel
