from tpufem.io.xdmf import read_xdmf, write_xdmf  # noqa: F401
