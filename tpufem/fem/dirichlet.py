"""Dirichlet boundary conditions.

Equivalent of ``fem::DirichletBC`` + ``fem::apply_lifting`` +
``fem::set_diagonal`` (reference: src/poisson_problem.cpp:77,134-135,152-155;
matrix-free row zeroing at src/cgpoisson_problem.cpp:207).  A BC is a set of
constrained *scalar/block* dofs plus their values; application is masking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DirichletBC:
    """Constrained dofs (scalar-space indices; all bs components constrained,
    matching the reference's blocked locate_dofs_topological) and values."""

    scalar_dofs: np.ndarray            # [nbc] int64, sorted unique
    value: float = 0.0                 # reference uses u0 = 0 everywhere
    ndofs_scalar: int = 0
    bs: int = 1

    @classmethod
    def from_space(cls, space, facets: np.ndarray, value: float = 0.0) -> "DirichletBC":
        dofs = space.locate_dofs_topological(facets)
        return cls(scalar_dofs=dofs, value=value,
                   ndofs_scalar=space.ndofs_scalar, bs=space.bs)

    @property
    def num_constrained(self) -> int:
        return self.scalar_dofs.shape[0] * self.bs

    def mask(self) -> np.ndarray:
        """[ndofs_scalar] bool, True at constrained scalar dofs."""
        m = np.zeros(self.ndofs_scalar, dtype=bool)
        m[self.scalar_dofs] = True
        return m

    def flat_dofs(self) -> np.ndarray:
        """Constrained dofs in the flat (bs-interleaved) numbering."""
        if self.bs == 1:
            return self.scalar_dofs
        return (self.bs * self.scalar_dofs[:, None]
                + np.arange(self.bs)[None, :]).reshape(-1)

    def set(self, x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
        """x[bc] = scale * value (reference bc->set, e.g.
        cgpoisson_problem.cpp:161,168)."""
        idx = jnp.asarray(self.flat_dofs())
        return x.at[idx].set(scale * self.value)

    def zero(self, x: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.asarray(self.flat_dofs())
        return x.at[idx].set(0.0)
