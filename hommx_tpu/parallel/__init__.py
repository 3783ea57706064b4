from hommx_tpu.parallel.sharding import shard_cells, device_mesh

__all__ = ["shard_cells", "device_mesh"]
