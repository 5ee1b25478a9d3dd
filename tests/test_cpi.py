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


def test_production_preset():
    """preset="production" must yield the measured-best TraceConfig
    (docs/PERF.md ledger) with explicit options overriding the preset,
    and reject unknown presets/options loudly."""
    import pytest

    from rts_tpu.sim import PRESETS, prepare_cpi

    w = make_world(num_pulses=1)
    params = Parameters(num_rays=3, max_refl_depth=2)
    base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float32, preset="production")
    p = PRESETS["production"]
    assert cfg.accel == p["accel"] == "cluster"
    assert cfg.cluster_size == p["cluster_size"]
    assert cfg.ray_tile == p["ray_tile"]
    assert cfg.candidates == p["candidates"]
    assert cfg.sub_tiles == p["sub_tiles"]
    assert cfg.refine and cfg.replay_cap == p["replay_cap"]
    assert batch.refine is not None  # ds residuals shipped
    # explicit options override the preset
    _, _, cfg2, _ = prepare_cpi(
        w, params, dtype=jnp.float32, preset="production", candidates=8, interpret=True
    )
    assert cfg2.candidates == 8 and cfg2.interpret and cfg2.accel == "cluster"
    with pytest.raises(ValueError, match="unknown preset"):
        prepare_cpi(w, params, preset="warp-speed")
    with pytest.raises(TypeError, match="unexpected options"):
        prepare_cpi(w, params, cluster_sise=512)


def test_production_preset_traces():
    """The full production pipeline (cluster + candidates + replay) runs
    end-to-end in interpret mode and meets the 1e-6 bar vs f64."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi

    w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
    params = Parameters(num_rays=3, max_refl_depth=2)
    b64, batch64, cfg64, spec64 = prepare_cpi(w, params, dtype=jnp.float64)
    ref = trace_cpi(b64, batch64, cfg64, spec64)
    base, batch, cfg, spec = prepare_cpi(
        w, params, dtype=jnp.float32, preset="production", interpret=True,
        cluster_size=128, ray_tile=128,  # tiny-scene-sized kernel blocks
    )
    out = trace_cpi(base, batch, cfg, spec)
    got = np.asarray(ref.received) >= 0
    assert got.sum() > 0
    np.testing.assert_array_equal(np.asarray(out.received), np.asarray(ref.received))
    pw_ref = np.asarray(ref.power, np.float64)[got]
    pw = np.asarray(out.power, np.float64)[got]
    assert np.abs(pw / pw_ref - 1.0).max() < 1e-6


def test_rx_geom_on_device_matches_host():
    """The on-device [P, NR] receiver-geometry path must match the host
    NumPy prep (same formulas; f64 here so both are exact) and trace to
    identical captures."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi

    w = make_world(num_pulses=3, rotating=True, target_speed=40.0)
    params = Parameters(num_rays=3, max_refl_depth=2)
    _, bh, _, _ = prepare_cpi(w, params, dtype=jnp.float64)
    base, bd, cfg, spec = prepare_cpi(w, params, dtype=jnp.float64, rx_geom_on_device=True)
    # the host path applies the reference's float32-trig parity narrowing
    # (receiver_geom strict_parity=True); the device path computes clean
    # trig — agreement is the f32 trig floor (~1e-7), not f64 exact
    for name in ("centre", "radius", "min_theta", "max_theta", "min_phi", "max_phi"):
        np.testing.assert_allclose(
            np.asarray(getattr(bd.rx_geom, name)),
            np.asarray(getattr(bh.rx_geom, name)),
            rtol=1e-6, atol=5e-6, err_msg=name,
        )
    out = trace_cpi(base, bd, cfg, spec)
    assert int((np.asarray(out.received) >= 0).sum()) > 0
    # refine needs f64 host centres — the combination must be rejected
    import pytest

    with pytest.raises(ValueError, match="rx_geom_on_device"):
        prepare_cpi(w, params, dtype=jnp.float32, refine=True, rx_geom_on_device=True)


def test_10k_pulse_prep_flat():
    """Host prep stays flat in pulse count with the production options ON
    (refine extras are fully vectorised — no per-pulse Python loop): a
    10k-pulse CPI must prep in bounded time without tracing."""
    import time

    from rts_tpu.sim import prepare_cpi

    w = make_world(num_pulses=10000, rotating=True, target_speed=30.0)
    t0 = time.perf_counter()
    base, batch, cfg, spec = prepare_cpi(
        w, Parameters(num_rays=2, max_refl_depth=2), dtype=jnp.float32, refine=True
    )
    prep_s = time.perf_counter() - t0
    assert batch.times.shape == (10000,)
    assert batch.refine is not None and batch.refine.fan_rot_hi.shape[0] == 10000
    assert prep_s < 30.0, f"10k-pulse host prep took {prep_s:.1f}s"


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


def test_postprocess_compaction_bit_identical():
    """The received-lane postprocess compaction (engine/cpi.py one_pulse:
    gains/RCS/atan2 evaluated on an agg_cap block instead of the full
    fan) is purely per-lane, so capped and full paths must be
    BIT-identical — including the count > cap lax.cond fallback."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi

    w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
    params = Parameters(num_rays=3, max_refl_depth=2)
    outs = {}
    for cap in (0, 4096, 2):  # full, capped, forced-overflow fallback
        base, batch, cfg, spec = prepare_cpi(
            w, params, dtype=jnp.float32, agg_cap=cap
        )
        outs[cap] = trace_cpi(base, batch, cfg, spec)
    got = np.asarray(outs[0].received) >= 0
    assert got.sum() > 2  # the cap=2 case must actually overflow
    for cap in (4096, 2):
        for name in ("power", "doppler", "delay", "received"):
            np.testing.assert_array_equal(
                np.asarray(getattr(outs[cap], name)),
                np.asarray(getattr(outs[0], name)),
                err_msg=f"cap={cap}: {name}",
            )
