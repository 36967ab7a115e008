from tpufem.parallel.indexmap import ShardIndexMaps, build_index_maps  # noqa: F401
