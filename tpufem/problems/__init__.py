from tpufem.problems import cgpoisson, elasticity, poisson  # noqa: F401
