"""rcs_angles elision: when every target RCS model is aspect-free the
tracer may skip recording per-bounce angle sums (TraceConfig.rcs_angles
— the recorded values are never read by postprocess, physics/rcs.py).
The trace must be BIT-identical in every other output, and the final
responses identical; angular models must keep the recording on."""

import copy

import numpy as np

import jax.numpy as jnp

from rts_tpu import Parameters
from rts_tpu.sim import Path, run_cpi, prepare_cpi

from test_driver import make_world
from test_cpi import _assert_same_responses


def test_auto_detection():
    from rts_tpu.physics.rcs import IsoRCS, PlateRCS, SphereRCS

    w = make_world()
    params = Parameters(num_rays=2, max_refl_depth=2)
    # default IsoRCS targets -> auto off
    _, _, cfg, _ = prepare_cpi(w, params)
    assert cfg.rcs_angles is False
    # forced on
    _, _, cfg, _ = prepare_cpi(w, params, rcs_angles=True)
    assert cfg.rcs_angles is True
    # any angular model -> on
    w.targets[0].rcs_model = PlateRCS(0.5, 0.5)
    _, _, cfg, _ = prepare_cpi(w, params)
    assert cfg.rcs_angles is True
    w.targets[0].rcs_model = SphereRCS(1.0)
    _, _, cfg, _ = prepare_cpi(w, params)
    assert cfg.rcs_angles is False
    # forcing OFF with an aspect-dependent model would evaluate the RCS
    # on the -1e6 sentinel angle sums — must refuse, not corrupt
    w.targets[0].rcs_model = PlateRCS(0.5, 0.5)
    import pytest

    with pytest.raises(ValueError, match="aspect"):
        prepare_cpi(w, params, rcs_angles=False)


def test_elision_bit_identical_trace():
    from rts_tpu.engine.cpi import trace_cpi

    w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
    w.targets[0].refl_coeff = 0.6
    w.targets[0].refr_index = 1.5  # spawn path exercises the child scatter
    params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
    outs = {}
    for on in (True, False):
        base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float32, rcs_angles=on)
        assert cfg.rcs_angles is on
        outs[on] = trace_cpi(base, batch, cfg, spec)
    got = np.asarray(outs[True].received) >= 0
    assert got.sum() > 0
    for name in ("power", "doppler", "delay", "received"):
        np.testing.assert_array_equal(
            np.asarray(getattr(outs[True], name)),
            np.asarray(getattr(outs[False], name)),
            err_msg=name,
        )


def test_responses_match_driver_with_elision():
    """run_cpi (auto rcs_angles=False for Iso targets) vs the sequential
    driver (always records angles): identical responses end-to-end."""
    from rts_tpu.sim import run

    w1 = make_world(num_pulses=3, rotating=True)
    w2 = copy.deepcopy(w1)
    params = Parameters(num_rays=3, max_refl_depth=2)
    run(w1, params, dtype=jnp.float64)
    _, _, cfg, _ = prepare_cpi(w2, params)
    assert cfg.rcs_angles is False
    run_cpi(w2, params, dtype=jnp.float64)
    _assert_same_responses(w1, w2)
