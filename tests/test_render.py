"""Range/Doppler synthesis: a moving target must land in the predicted
range and Doppler bins (BASELINE config 5 end-to-end)."""

import jax.numpy as jnp
import numpy as np

from rts_tpu import Parameters
from rts_tpu.sim import Path, RenderGrid, render_cpi_result, run_cpi

from test_driver import make_world

C = 299792458.0
CARRIER = 10e9
PRF = 1000.0


def test_range_doppler_peak():
    speed = 5.0  # m/s receding -> f_d ~ -2 v f / c = -333.6 Hz
    num_pulses = 32
    w = make_world(num_pulses=num_pulses, target_speed=speed)

    params = Parameters(num_rays=1, max_refl_depth=2)
    out = run_cpi(w, params, dtype=jnp.float64, attach_responses=False)

    fs = 50e6
    grid = RenderGrid(sample_rate=fs, num_samples=512, window_start=6.0e-6)
    # one-sample pulse -> unambiguous range bin (a longer rect envelope
    # gives a flat plateau where argmax is arbitrary)
    rd, samples = render_cpi_result(out, rx_index=0, grid=grid, pulse_length=1.0 / fs)
    rd = np.asarray(rd)

    # expected range bin: first sample after the two-999 m-leg delay
    delay = 2 * 999.0 / C
    exp_col = int(np.ceil((delay - grid.window_start) * fs))
    # expected Doppler bin: relativistic vr = -speed
    vr = -speed
    fd = CARRIER * ((1 + vr / C) / (1 - vr / C) - 1)
    exp_row = num_pulses // 2 + int(round(fd / (PRF / num_pulses)))

    row, col = np.unravel_index(np.argmax(rd), rd.shape)
    assert abs(col - exp_col) <= 1, (col, exp_col)
    assert abs(row - exp_row) <= 1, (row, exp_row)


def test_static_target_zero_doppler():
    num_pulses = 16
    w = make_world(num_pulses=num_pulses)
    params = Parameters(num_rays=1, max_refl_depth=2)
    out = run_cpi(w, params, dtype=jnp.float64, attach_responses=False)
    grid = RenderGrid(sample_rate=50e6, num_samples=512, window_start=6.0e-6)
    rd, _ = render_cpi_result(out, rx_index=0, grid=grid, pulse_length=2e-7)
    row, _ = np.unravel_index(np.argmax(np.asarray(rd)), rd.shape)
    assert row == num_pulses // 2  # zero-Doppler ridge


def test_empty_map_when_no_returns():
    w = make_world()
    w.targets[0].path = Path.fixed(0, 0, 1e7)  # far away, fan misses
    params = Parameters(num_rays=1, max_refl_depth=1)
    out = run_cpi(w, params, dtype=jnp.float64, attach_responses=False)
    grid = RenderGrid(sample_rate=50e6, num_samples=128, window_start=0.0)
    rd, samples = render_cpi_result(out, rx_index=0, grid=grid)
    assert float(np.abs(np.asarray(samples)).max()) == 0.0


def test_chirp_pulse_compression():
    """LFM chirp + matched filter: peak at the path bin, compressed."""
    import jax.numpy as jnp

    from rts_tpu.sim import RenderGrid
    from rts_tpu.sim.render import pulse_compress, synthesize_cpi, waveform_replica

    fs = 50e6
    grid = RenderGrid(sample_rate=fs, num_samples=1024, window_start=0.0)
    pulse_len = 4e-6  # 200 samples uncompressed
    chirp = 5e12  # 20 MHz sweep -> compressed width ~ fs/B = 2.5 samples
    delay = 200 / fs  # bin 200

    power = jnp.array([[1.0]])
    samples = synthesize_cpi(
        power,
        jnp.array([[delay]]),
        jnp.array([[0.0]]),
        jnp.array([[0.0]]),
        jnp.array([[True]]),
        grid,
        pulse_length=pulse_len,
        chirp_rate=chirp,
    )
    replica = waveform_replica(grid, pulse_length=pulse_len, chirp_rate=chirp)
    comp = np.abs(np.asarray(pulse_compress(samples, replica)))[0]

    peak = int(np.argmax(comp))
    assert peak == 200, peak
    # compression: half-power width a few bins, not the 200-sample pulse
    half = comp > comp[peak] / np.sqrt(2)
    assert half.sum() <= 6, half.sum()
    # uncompressed envelope really was ~200 samples
    raw = np.abs(np.asarray(samples))[0]
    assert (raw > raw.max() / 2).sum() >= 190


def test_thermal_noise_power():
    """AWGN power matches k_B * T * B."""
    import jax

    from rts_tpu.sim.render import BOLTZMANN, add_thermal_noise

    t, b = 290.0, 50e6
    samples = jnp.zeros((64, 4096), jnp.complex64)
    noisy = add_thermal_noise(samples, t, b, jax.random.PRNGKey(0))
    measured = float(jnp.mean(jnp.abs(noisy) ** 2))
    expected = BOLTZMANN * t * b
    np.testing.assert_allclose(measured, expected, rtol=0.02)


def test_cli_info_and_run(tmp_path, capsys):
    import json

    from rts_tpu.__main__ import main
    from test_config_io import DOC

    scene = tmp_path / "scene.json"
    scene.write_text(json.dumps(DOC))
    assert main(["info", str(scene)]) == 0
    assert "transmitters (1)" in capsys.readouterr().out
    out_npz = str(tmp_path / "resp.npz")
    assert main(["run", str(scene), "--out", out_npz]) == 0
    assert "responses: 1" in capsys.readouterr().out
    import os

    assert os.path.exists(out_npz)
