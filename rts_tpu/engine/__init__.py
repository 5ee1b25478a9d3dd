from rts_tpu.engine.types import DeviceScene, RxGeomDevice, TraceConfig, scene_to_device
from rts_tpu.engine.wavefront import trace_pulse

__all__ = ["DeviceScene", "RxGeomDevice", "TraceConfig", "scene_to_device", "trace_pulse"]
