"""Waveform library: stored/sampled waveforms and range-sidelobe windows
(the TransmitterPulse/RadarSignal surface hands in arbitrary waveforms,
ray_tracer.cpp:812-815; rendering is where they act)."""

import numpy as np
import pytest

from rts_tpu.sim import RadarSignal
from rts_tpu.sim.render import (
    RenderGrid,
    hamming_window,
    pulse_compress,
    synthesize_pulse,
    taylor_window,
    waveform_replica,
)

FS = 200e6
PL = 2e-6
K = 50e6 / PL  # 50 MHz LFM


def lfm_samples(fs=FS, pl=PL, k=K):
    t = np.arange(int(round(pl * fs))) / fs
    return np.exp(1j * np.pi * k * t * t)


def grid(ns=4096, start=0.0):
    return RenderGrid(sample_rate=FS, num_samples=ns, window_start=start)


def _psl_db(mag, peak_idx, guard):
    """Peak sidelobe level (dB rel. mainlobe), excluding +-guard bins."""
    m = mag / mag.max()
    mask = np.ones_like(m, bool)
    mask[max(0, peak_idx - guard) : peak_idx + guard + 1] = False
    return 20.0 * np.log10(m[mask].max())


class TestStoredWaveform:
    def test_stored_matches_analytic_lfm(self):
        """A stored LFM sampled at the grid rate reproduces the analytic
        envelope exactly at sample-aligned times."""
        wave = RadarSignal.from_samples(lfm_samples(), FS, carrier=10e9, chirp_rate=0.0)
        analytic = RadarSignal(carrier=10e9, length=PL, chirp_rate=K)
        rel = np.arange(int(PL * FS)) / FS
        np.testing.assert_allclose(
            np.asarray(wave.envelope(rel, xp=np)),
            np.asarray(analytic.envelope(rel, xp=np)),
            atol=2e-7,
        )

    def test_envelope_zero_outside(self):
        wave = RadarSignal.from_samples(lfm_samples(), FS)
        vals = np.asarray(wave.envelope(np.array([-1e-9, PL + 1e-9, -5.0, 5.0]), xp=np))
        np.testing.assert_array_equal(vals, 0.0)

    def test_linear_interpolation_between_samples(self):
        iq = np.array([0.0 + 0j, 1.0 + 1j, 0.5 - 0.5j])
        wave = RadarSignal.from_samples(iq, rate=1.0)
        got = np.asarray(wave.envelope(np.array([0.5, 1.5]), xp=np))
        np.testing.assert_allclose(got, [0.5 + 0.5j, 0.75 + 0.25j], rtol=1e-6)

    def test_from_file_roundtrip(self, tmp_path):
        iq = lfm_samples()
        p = tmp_path / "wf.npy"
        np.save(p, iq)
        wave = RadarSignal.from_file(str(p), FS)
        np.testing.assert_allclose(np.asarray(wave.samples), iq.astype(np.complex64))
        # text format: one "I Q" per line
        p2 = tmp_path / "wf.txt"
        np.savetxt(p2, np.stack([iq.real, iq.imag], axis=1))
        wave2 = RadarSignal.from_file(str(p2), FS)
        np.testing.assert_allclose(np.asarray(wave2.samples), iq.astype(np.complex64), atol=1e-6)

    def test_stored_compression_peak_at_delay(self):
        """Synthesize one return from a stored waveform and compress:
        the peak must land at the path's delay bin."""
        wave = RadarSignal.from_samples(lfm_samples(), FS)
        g = grid()
        delay = 640 / FS  # exactly bin 640
        s = synthesize_pulse(
            np.array([1.0]), np.array([delay]), np.array([0.0]), np.array([0.0]),
            np.array([True]), g, wave=wave, xp=np,
        )
        rep = waveform_replica(g, wave=wave, xp=np)
        out = np.abs(np.asarray(pulse_compress(s, rep, xp=np)))
        assert int(out.argmax()) == 640


class TestRangeWindows:
    def test_taylor_window_shape(self):
        w = np.asarray(taylor_window(512, nbar=4, sll_db=35.0))
        assert w.shape == (512,)
        assert abs(w.max() - 1.0) < 1e-12
        np.testing.assert_allclose(w, w[::-1], rtol=1e-9)  # symmetric
        assert w[0] > 0.1  # Taylor is a near-uniform taper, high pedestal

    def test_hamming_window_endpoints(self):
        w = np.asarray(hamming_window(101))
        np.testing.assert_allclose(w[0], 0.08, atol=1e-12)
        np.testing.assert_allclose(w[50], 1.0, atol=1e-12)

    def test_lfm_sidelobes_rect_vs_taylor(self):
        """Golden (-35 dB bar): high-TB LFM (TB = 400, where Fresnel
        ripple no longer dominates) compressed with the Taylor(-35 dB)
        band weighting must bring the peak sidelobe under -35 dB; the
        unweighted matched filter stays in the -13..-21 dB regime."""
        pl, k = 8e-6, 50e6 / 8e-6
        g = RenderGrid(sample_rate=FS, num_samples=8192, window_start=0.0)
        delay = 2048 / FS
        s = synthesize_pulse(
            np.array([1.0]), np.array([delay]), np.array([0.0]), np.array([0.0]),
            np.array([True]), g, pulse_length=pl, chirp_rate=k, xp=np,
        )
        rep = waveform_replica(g, pulse_length=pl, chirp_rate=k, xp=np)
        rect = np.abs(np.asarray(pulse_compress(s, rep, xp=np)))
        tay = np.abs(np.asarray(pulse_compress(s, rep, xp=np, window="taylor")))
        pk_r, pk_t = int(rect.argmax()), int(tay.argmax())
        assert abs(pk_r - 2048) <= 1 and abs(pk_t - 2048) <= 1
        psl_rect = _psl_db(rect, pk_r, guard=10)
        psl_tay = _psl_db(tay, pk_t, guard=24)  # windowing widens the mainlobe
        assert psl_rect > -22.0, psl_rect  # unweighted LFM regime
        assert psl_tay < -35.0, psl_tay

    def test_hamming_reduces_sidelobes_too(self):
        pl, k = 8e-6, 50e6 / 8e-6
        g = RenderGrid(sample_rate=FS, num_samples=8192, window_start=0.0)
        delay = 512 / FS
        s = synthesize_pulse(
            np.array([1.0]), np.array([delay]), np.array([0.0]), np.array([0.0]),
            np.array([True]), g, pulse_length=pl, chirp_rate=k, xp=np,
        )
        rep = waveform_replica(g, pulse_length=pl, chirp_rate=k, xp=np)
        ham = np.abs(np.asarray(pulse_compress(s, rep, xp=np, window="hamming")))
        assert _psl_db(ham, int(ham.argmax()), guard=24) < -35.0

    def test_unknown_window_raises(self):
        g = grid(256)
        s = np.zeros(256, np.complex64)
        rep = waveform_replica(g, pulse_length=PL, xp=np)
        with pytest.raises(ValueError, match="unknown range window"):
            pulse_compress(s, rep, xp=np, window="kaiser", sample_rate=FS, bandwidth=1e6)
