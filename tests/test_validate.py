"""Scene/world validation."""

import numpy as np
import pytest

from rts_tpu import Parameters
from rts_tpu.geometry import sphere_mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.utils import SceneValidationError, validate_scene, validate_world

from test_driver import make_world


def test_clean_scene_passes():
    mesh, _ = sphere_mesh(2, 5.0)
    scene = compile_scene([mesh], [0.9], [1.0])
    assert validate_scene(scene) == []


def test_nan_vertices_rejected():
    mesh, _ = sphere_mesh(1, 5.0)
    scene = compile_scene([mesh], [0.9], [1.0])
    scene.tri_verts[0, 0, 0] = np.nan
    with pytest.raises(SceneValidationError, match="NaN"):
        validate_scene(scene)


def test_bad_refraction_index_rejected():
    mesh, _ = sphere_mesh(1, 5.0)
    scene = compile_scene([mesh], [0.9], [-1.0])
    with pytest.raises(SceneValidationError, match="refractive"):
        validate_scene(scene)


def test_world_checks():
    w = make_world()
    assert validate_world(w, Parameters(num_rays=3)) == []
    warns = validate_world(w, Parameters(num_rays=4))
    assert any("boresight" in x for x in warns)
    w.receivers[0].sphere = (0.0, 1.0, 1.0)
    with pytest.raises(SceneValidationError, match="radius"):
        validate_world(w, Parameters())
    w2 = make_world()
    w2.transmitters = []
    with pytest.raises(SceneValidationError, match="no transmitters"):
        validate_world(w2, Parameters())
