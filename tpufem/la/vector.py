"""Distributed-vector operations.

Equivalent of ``dolfinx::la::Vector`` ops: axpy (reference src/cg.h:18-25),
inner_product / squared_norm / norm (src/cg.h:53,65,74, src/main.cpp:229),
and orthonormalize / is_orthonormal (src/elasticity_problem.cpp:74-81).

Single-shard versions here; the sharded path wraps them with ``psum``
inside ``shard_map`` (tpufem.parallel).  Reductions accumulate in float64
when x64 is enabled so f32 vectors keep usable dot products at scale.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _acc_dtype(x: jnp.ndarray):
    if x.dtype == jnp.float32 and jax.config.jax_enable_x64:
        return jnp.float64
    return x.dtype


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    t = _acc_dtype(a)
    return jnp.sum(a.astype(t) * b.astype(t))


def squared_norm(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(squared_norm(a))


def axpy(alpha, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """alpha * x + y (reference src/cg.h:18-25)."""
    return alpha * x + y


def orthonormalize(basis: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Modified Gram-Schmidt over a small set of vectors (the 6 rigid-body
    modes; reference la::orthonormalize at elasticity_problem.cpp:74)."""
    out: List[jnp.ndarray] = []
    for v in basis:
        for u in out:
            v = v - dot(u, v).astype(v.dtype) * u
        n = norm(v).astype(v.dtype)
        out.append(v / n)
    return out


def is_orthonormal(basis: List[jnp.ndarray], eps: float = 1e-4) -> bool:
    """Hard check mirroring la::is_orthonormal
    (reference elasticity_problem.cpp:76-81)."""
    for i, u in enumerate(basis):
        for j, v in enumerate(basis):
            want = 1.0 if i == j else 0.0
            if abs(float(dot(u, v)) - want) > eps:
                return False
    return True
