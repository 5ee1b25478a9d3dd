"""Batched-CPI path vs the sequential driver: identical responses."""

import copy

import jax.numpy as jnp
import numpy as np

from rts_tpu import Parameters
from rts_tpu.sim import Path, run, run_cpi

from test_driver import make_world


def _points(world):
    return [p for rx in world.receivers for r in rx.responses for p in r.points]


def _assert_same_responses(w1, w2, *, rtol=1e-12):
    r1, r2 = _points(w1), _points(w2)
    assert len(r1) == len(r2) > 0
    key = lambda p: (p.time, p.delay)
    for a, b in zip(sorted(r1, key=key), sorted(r2, key=key)):
        np.testing.assert_allclose(a.power, b.power, rtol=rtol)
        np.testing.assert_allclose(a.delay, b.delay, rtol=rtol)
        np.testing.assert_allclose(a.phase, b.phase, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(a.doppler, b.doppler, rtol=rtol, atol=1e-12)
        assert a.noise_temperature == b.noise_temperature


def test_cpi_matches_driver_moving_rotating():
    w1 = make_world(num_pulses=4, rotating=True)
    w1.targets[0].path = Path.linear([(0.0, (1000.0, 0.0, 0.0)), (1.0, (1080.0, 5.0, 0.0))])
    w2 = copy.deepcopy(w1)
    params = Parameters(num_rays=3, max_refl_depth=2)
    run(w1, params, dtype=jnp.float64)
    run_cpi(w2, params, dtype=jnp.float64)
    _assert_same_responses(w1, w2)


def test_cpi_matches_driver_refraction():
    w1 = make_world()
    w1.targets[0].refl_coeff = 0.6
    w1.targets[0].refr_index = 1.5
    w2 = copy.deepcopy(w1)
    params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
    run(w1, params, dtype=jnp.float64)
    run_cpi(w2, params, dtype=jnp.float64)
    _assert_same_responses(w1, w2)
