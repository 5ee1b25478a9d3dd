from rts_tpu.parallel.sharding import make_mesh, shard_batch, trace_cpi_sharded

__all__ = ["make_mesh", "shard_batch", "trace_cpi_sharded"]
