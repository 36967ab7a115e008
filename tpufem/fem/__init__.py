from tpufem.fem.reference import ReferenceTet, tet_quadrature, triangle_quadrature  # noqa: F401

