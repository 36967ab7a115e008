from tpufem.la.cg import cg_solve  # noqa: F401
from tpufem.la.vector import axpy, dot, norm, orthonormalize, squared_norm  # noqa: F401
