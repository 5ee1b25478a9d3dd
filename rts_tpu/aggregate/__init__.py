from rts_tpu.aggregate.paths import LaneAggregate, aggregate_lanes

__all__ = ["LaneAggregate", "aggregate_lanes"]
