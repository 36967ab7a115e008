from tpufem.mesh.structured import (  # noqa: F401
    BoxTetMesh,
    compute_box_size,
    num_entities,
    num_pdofs,
)
from tpufem.mesh.topology import TetTopology  # noqa: F401
