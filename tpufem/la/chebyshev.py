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

from typing import Callable, Tuple

import jax
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


def _cheb_coeffs(lmax: float, degree: int, lo_frac: float,
                 hi_frac: float):
    """Static recurrence coefficients: (theta, and per-step
    (c1, c2) = (rho_new * rho, 2 * rho_new / delta))."""
    a = lo_frac * lmax
    b_ = hi_frac * lmax
    theta = 0.5 * (b_ + a)
    delta = 0.5 * (b_ - a)
    sigma = theta / delta
    rho = 1.0 / sigma
    c1, c2 = [], []
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        c1.append(rho_new * rho)
        c2.append(2.0 * rho_new / delta)
        rho = rho_new
    return theta, np.asarray(c1), np.asarray(c2)


def _cheb_scan(matvec, dinv, x, r, d, c1: np.ndarray, c2: np.ndarray,
               dtype) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared recurrence loop: ``lax.scan`` over the static coefficient
    arrays, so the (possibly huge) ``matvec`` computation appears ONCE
    in the lowered program for any degree — the unrolled form's
    degree-many inlined stencil applies dominated XLA compile time on
    the const-table operators."""
    if c1.size == 0:
        return x, r, d

    def body(carry, cs):
        x, r, d = carry
        c1_, c2_ = cs
        r = r - matvec(d)
        d = c1_ * d + c2_ * (dinv * r)
        x = x + d
        return (x, r, d), None

    cs = (jnp.asarray(c1, dtype=dtype), jnp.asarray(c2, dtype=dtype))
    (x, r, d), _ = jax.lax.scan(body, (x, r, d), cs)
    return x, r, d


def chebyshev_smoother(matvec: Callable, dinv: jnp.ndarray, lmax: float,
                       degree: int = 2, lo_frac: float = 0.1,
                       hi_frac: float = 1.1) -> Callable:
    """Returns smooth(x, b) performing ``degree`` Chebyshev iterations of
    the Jacobi-preconditioned operator over [lo_frac*lmax, hi_frac*lmax]
    (PETSc's default GAMG interval scaling).  Coefficients are Python
    floats baked at trace time — static, jit-friendly.  The lowered
    program holds exactly TWO matvec instances (initial residual + the
    scanned recurrence) regardless of degree."""
    theta, c1, c2 = _cheb_coeffs(lmax, degree, lo_frac, hi_frac)

    def smooth(x: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        r = rhs - matvec(x)
        d = (1.0 / theta) * (dinv * r)
        x = x + d
        x, r, d = _cheb_scan(matvec, dinv, x, r, d, c1, c2, rhs.dtype)
        return x

    return smooth


def chebyshev_smoother_zero(matvec: Callable, dinv: jnp.ndarray,
                            lmax: float, degree: int = 2,
                            lo_frac: float = 0.1,
                            hi_frac: float = 1.1) -> Callable:
    """smooth_zero(rhs) -> (x, r): Chebyshev from a ZERO initial guess
    with residual tracking — on return r = rhs - A x.

    Multigrid pre-smoothing always starts from x = 0 and always needs
    the post-smoothing residual for the restriction; tracking r through
    the recurrence gives both in ``degree`` matvecs (vs degree + 2 for
    smooth(0, rhs) + an explicit residual: the A@0 apply and the extra
    full-field A x).  Exactly TWO matvec instances in the lowered
    program for any degree (one scanned + the closing residual)."""
    theta, c1, c2 = _cheb_coeffs(lmax, degree, lo_frac, hi_frac)

    def smooth_zero(rhs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = (1.0 / theta) * (dinv * rhs)
        x = d
        x, r, d = _cheb_scan(matvec, dinv, x, rhs, d, c1, c2, rhs.dtype)
        r = r - matvec(d)
        return x, r

    return smooth_zero
