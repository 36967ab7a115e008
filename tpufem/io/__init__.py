from tpufem.io.xdmf import write_xdmf  # noqa: F401
