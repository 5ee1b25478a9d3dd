from rts_tpu.core import constants, vec, rotation, vectypes
from rts_tpu.core.constants import (
    SCENE_EPS,
    SCENE_EPS_R,
    EARTH_RADIUS,
    SPEED_OF_LIGHT,
)
from rts_tpu.core.vectypes import SVec3, Vec3, d3_to_v3, svec3

__all__ = [
    "constants",
    "vec",
    "rotation",
    "vectypes",
    "SCENE_EPS",
    "SCENE_EPS_R",
    "EARTH_RADIUS",
    "SPEED_OF_LIGHT",
    "SVec3",
    "Vec3",
    "d3_to_v3",
    "svec3",
]
