from rts_tpu.accel.cluster import cluster_aabbs, cluster_reorder, morton_order

__all__ = ["cluster_aabbs", "cluster_reorder", "morton_order"]
