from rts_tpu.ops.cluster_trace import closest_hit_clustered, pack_tri_fields

__all__ = ["closest_hit_clustered", "pack_tri_fields"]
