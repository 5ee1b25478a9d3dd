from rts_tpu.utils.timing import PhaseTimer, trace_annotation

__all__ = ["PhaseTimer", "trace_annotation"]
