"""Shared problem-construction helpers."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Problem:
    """What a problem constructor returns — the analogue of the reference's
    ``{b, u, solver_function}`` tuple (src/poisson_problem.h:19-23)."""

    b: jnp.ndarray
    u: jnp.ndarray
    solver_function: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, int]]
    space: object
    bc: object
    operator = None  # assembled ELLMatrix when applicable


def facet_to_cell(cell_faces: np.ndarray, facets: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(cell index, local face index) of each (boundary) facet.

    The facet->cell connectivity of the reference
    (``create_connectivity(2, 3)``, src/main.cpp:148).  Boundary facets
    belong to exactly one cell, so any match is the owner.
    """
    flat = cell_faces.reshape(-1)
    order = np.argsort(flat, kind="stable")
    pos = np.searchsorted(flat[order], facets)
    hit = order[pos]
    if not np.array_equal(flat[hit], facets):
        raise ValueError("facet not found in cell_faces")
    return hit // cell_faces.shape[1], hit % cell_faces.shape[1]


def poisson_f_xy(x, y, xp=np):
    """RHS bump on broadcastable x/y coordinate arrays, ``xp`` = numpy
    or jax.numpy — the SINGLE source of the closed form for both the
    host and on-device assembly paths (they must not diverge)."""
    return 10.0 * xp.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.02)


def poisson_f(x: np.ndarray) -> np.ndarray:
    """RHS bump  f = 10 exp(-((x-.5)^2+(y-.5)^2)/0.02)
    (reference: src/poisson_problem.cpp:85-98)."""
    return poisson_f_xy(x[:, 0], x[:, 1])


def poisson_g(x: np.ndarray) -> np.ndarray:
    """Surface coefficient g = sin(5 x0)
    (reference: src/poisson_problem.cpp:99-106)."""
    return np.sin(5.0 * x[:, 0])


def poisson_bc_marker(x: np.ndarray) -> np.ndarray:
    """Dirichlet planes x0 = 0 and x0 = 1
    (reference: src/poisson_problem.cpp:58-71)."""
    eps = 1.0e-8
    return (np.abs(x[:, 0]) < eps) | (np.abs(x[:, 0] - 1.0) < eps)


def elasticity_f_components(x, y, z, xp=np):
    """Rotational body force (-dz*r*y, 1, dx*r*y) on broadcastable
    coordinate arrays, ``xp`` = numpy or jax.numpy — the SINGLE source
    of the closed form for both the host and on-device assembly paths
    (reference: src/elasticity_problem.cpp:154-176)."""
    dx = x - 0.5
    dz = z - 0.5
    r = xp.sqrt(dx * dx + dz * dz)
    return (-dz * r * y, xp.ones_like(r * y), dx * r * y)


def elasticity_f(x: np.ndarray) -> np.ndarray:
    """Rotational body force at point rows [n, 3]."""
    return np.stack(
        elasticity_f_components(x[:, 0], x[:, 1], x[:, 2]), axis=-1)


def elasticity_bc_marker(x: np.ndarray) -> np.ndarray:
    """Clamped y = 0 plane (reference: src/elasticity_problem.cpp:125-138)."""
    return np.abs(x[:, 1]) < 1.0e-8


def resolve_dtype(cfg):
    """Map cfg.dtype to the jnp dtype, refusing the silent-downcast
    trap: requesting float64 with jax_enable_x64 off would build every
    array as float32 while the refinement/certification logic (and the
    user) believes the run is f64.  The CLI enables x64 for
    --dtype float64 (cli.py); library callers must do the same."""
    import jax
    import jax.numpy as jnp
    if cfg.dtype == "float64":
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "dtype='float64' requires jax_enable_x64 (the CLI sets "
                "it; library callers: jax.config.update('jax_enable_x64',"
                " True) before building the problem) — without it every "
                "array silently downcasts to float32")
        return jnp.float64
    return jnp.float32
