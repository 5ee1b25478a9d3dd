from rts_tpu.core import constants, vec, rotation
from rts_tpu.core.constants import (
    SCENE_EPS,
    SCENE_EPS_R,
    EARTH_RADIUS,
    SPEED_OF_LIGHT,
)

__all__ = [
    "constants",
    "vec",
    "rotation",
    "SCENE_EPS",
    "SCENE_EPS_R",
    "EARTH_RADIUS",
    "SPEED_OF_LIGHT",
]
