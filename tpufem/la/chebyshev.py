"""Chebyshev polynomial smoother (Jacobi-preconditioned).

Replacement for the reference's recommended AMG level smoother
``-mg_levels_ksp_type chebyshev -mg_levels_pc_type jacobi`` with CG
eigenvalue estimation (reference: README.md:78-79).  Smooths on the
interval [lo_frac * lmax, hi_frac * lmax] of the Jacobi-preconditioned
operator D^-1 A; lmax is estimated at setup by power iteration.

Standard three-term recurrence (as in hypre/MFEM Chebyshev relaxation);
the error propagator equals the scaled-and-shifted Chebyshev polynomial
T_m((theta - lambda)/delta) / T_m(theta/delta), verified in tests.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def power_iteration_lmax(matvec, dinv: np.ndarray, n: int,
                         iters: int = 25, seed: int = 0) -> float:
    """Host-side estimate of lambda_max(D^-1 A) (the CG eigenvalue
    estimation analogue, ``-mg_levels_esteig_ksp_type cg``)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = dinv * matvec(v)
        lam = float(np.linalg.norm(w))
        if lam == 0.0:
            return 1.0
        v = w / lam
    return lam


def chebyshev_smoother(matvec: Callable, dinv: jnp.ndarray, lmax: float,
                       degree: int = 2, lo_frac: float = 0.1,
                       hi_frac: float = 1.1) -> Callable:
    """Returns smooth(x, b) performing ``degree`` Chebyshev iterations of
    the Jacobi-preconditioned operator over [lo_frac*lmax, hi_frac*lmax]
    (PETSc's default GAMG interval scaling).  Coefficients are Python
    floats baked at trace time — static, jit-friendly."""
    a = lo_frac * lmax
    b_ = hi_frac * lmax
    theta = 0.5 * (b_ + a)
    delta = 0.5 * (b_ - a)
    sigma = theta / delta

    def smooth(x: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        r = rhs - matvec(x)
        d = (1.0 / theta) * (dinv * r)
        x = x + d
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - matvec(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
            x = x + d
            rho = rho_new
        return x

    return smooth
