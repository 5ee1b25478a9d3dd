"""Persistence round-trips: one schema, two containers (.npz and .h5 —
the FERS/SOARS-ecosystem HDF5 surface, SURVEY.md §0/§5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rts_tpu import Parameters
from rts_tpu.sim import run
from rts_tpu.sim.cpi import prepare_cpi
from rts_tpu.engine.cpi import trace_cpi
from rts_tpu.sim.export import HAVE_HDF5, load_cpi, load_responses, save_cpi, save_responses

from test_driver import make_world


def _traced_cpi():
    w = make_world(num_pulses=2, target_speed=40.0)
    base, batch, cfg, spec = prepare_cpi(w, Parameters(num_rays=3, max_refl_depth=2), dtype=jnp.float64)
    return trace_cpi(base, batch, cfg, spec), batch


@pytest.mark.parametrize("ext", ["npz", "h5"])
def test_cpi_roundtrip(tmp_path, ext):
    if ext == "h5" and not HAVE_HDF5:
        pytest.skip("h5py not in image")
    out, batch = _traced_cpi()
    p = str(tmp_path / f"cpi.{ext}")
    save_cpi(p, out, times=batch.times)
    back = load_cpi(p)
    np.testing.assert_array_equal(back["received"], np.asarray(out.received))
    np.testing.assert_array_equal(back["agg_emit"], np.asarray(out.agg.emit))
    np.testing.assert_allclose(back["power"], np.asarray(out.power), rtol=0)
    np.testing.assert_allclose(back["agg_phase"], np.asarray(out.agg.phase), rtol=0)
    np.testing.assert_allclose(back["agg_phase_lo"], np.asarray(out.agg.phase_lo), rtol=0)
    np.testing.assert_allclose(back["times"], np.asarray(batch.times), rtol=0)


@pytest.mark.parametrize("ext", ["npz", "h5"])
def test_responses_roundtrip(tmp_path, ext):
    if ext == "h5" and not HAVE_HDF5:
        pytest.skip("h5py not in image")
    w = make_world(num_pulses=2)
    run(w, Parameters(num_rays=3, max_refl_depth=2))
    n_points = sum(len(r.points) for rx in w.receivers for r in rx.responses)
    assert n_points > 0
    p = str(tmp_path / f"resp.{ext}")
    save_responses(p, w)
    back = load_responses(p)
    assert back["power"].shape == (n_points,)
    assert back["meta"]["receivers"] == [rx.name for rx in w.receivers]
    assert str(np.asarray(back["tx_name"]).astype("U")[0]) == "tx0"
    # identical payloads across containers
    if ext == "h5":
        p2 = str(tmp_path / "resp.npz")
        save_responses(p2, w)
        back2 = load_responses(p2)
        for k in ("power", "delay", "phase", "doppler", "rx_index"):
            np.testing.assert_array_equal(back[k], back2[k])
