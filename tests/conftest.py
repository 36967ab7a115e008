"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world fake backend for multi-chip-without-a-cluster
(the reference's analogue is `mpirun -np 2` on one machine,
.github/workflows/ccpp.yml:73).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
