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


def test_256_pulse_cpi_range_doppler():
    """Full 256-pulse CPI (BASELINE config 5 scale): traced in one jit,
    rendered to a range-Doppler map with the target in the right bins."""
    from rts_tpu.sim import RenderGrid, render_cpi_result

    speed = 3.0
    w = make_world(num_pulses=256, target_speed=speed)
    out = run_cpi(w, Parameters(num_rays=1, max_refl_depth=2),
                  dtype=jnp.float64, attach_responses=False)
    assert out.received.shape[0] == 256
    assert int((np.asarray(out.received) >= 0).sum()) == 256

    c = 299792458.0
    fs = 50e6
    grid = RenderGrid(sample_rate=fs, num_samples=512, window_start=6.0e-6)
    rd, _ = render_cpi_result(out, 0, grid, pulse_length=1.0 / fs)
    rd = np.asarray(rd)
    row, col = np.unravel_index(np.argmax(rd), rd.shape)
    exp_col = int(np.ceil((2 * 999.0 / c - grid.window_start) * fs))
    fd = 10e9 * ((1 - speed / c) / (1 + speed / c) - 1)
    exp_row = 128 + int(round(fd / (1000.0 / 256)))
    assert abs(col - exp_col) <= 1
    assert abs(row - exp_row) <= 1


def test_large_cpi_prep_vectorized():
    """Host-side CPI prep has no per-pulse Python loop: a 4096-pulse CPI
    preps in under ~seconds and traces correctly (VERDICT r1 item 8)."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from rts_tpu import Parameters
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi

    from test_driver import make_world

    w = make_world(num_pulses=4096, rotating=True, target_speed=30.0)
    t0 = time.perf_counter()
    base, batch, cfg, spec = prepare_cpi(w, Parameters(num_rays=2, max_refl_depth=2), dtype=jnp.float32)
    prep_s = time.perf_counter() - t0
    assert prep_s < 30.0, f"host prep took {prep_s:.1f}s"
    assert batch.times.shape == (4096,)
    out = trace_cpi(base, batch, cfg, spec)
    rec = np.asarray(out.received)
    assert rec.shape[0] == 4096
    # pulse geometry must actually vary across the CPI (moving/rotating)
    assert not np.allclose(np.asarray(batch.pos[0]), np.asarray(batch.pos[-1]))
