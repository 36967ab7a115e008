"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world fake backend for multi-chip-without-a-cluster
(the reference's analogue is `mpirun -np 2` on one machine,
.github/workflows/ccpp.yml:73).

Note: in this environment the TPU is reached through the experimental
'axon' tunnel plugin, which ignores JAX_PLATFORMS — force CPU through
both the legacy env var and the config knob before any backend init.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: CG/multigrid programs dominate suite time
# on this 1-vCPU host; cached reruns cut minutes to seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
