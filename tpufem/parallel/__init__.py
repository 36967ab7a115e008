"""Distributed (SPMD) solver machinery.

- slab: z-slab decomposition for the structured cube path
- gmap: general owned/ghost index maps + edge-colored ppermute schedules
- rowshard: row-sharded assembled solver for unstructured meshes
- multihost: jax.distributed init + per-host materialization
"""
