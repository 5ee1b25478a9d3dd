"""Signal rendering: responses -> baseband samples -> range/Doppler maps.

The reference stops at handing ``Response`` objects to the external
simulator's renderer ("Pt applied downstream in rsresponse",
ray_tracer.cpp:1247).  This module completes the chain (BASELINE.md
config 5: "full range/Doppler synthesis, 256-pulse CPI"):

  * each unique-path response contributes a delayed, phase-rotated,
    Doppler-shifted copy of the transmit envelope to its receiver's
    fast-time sample grid, scaled by sqrt(Pt * power_gain) (voltage);
  * pulses stack into a [P, Ns] slow-time x fast-time matrix;
  * windowed FFT over slow time gives the range-Doppler map.

All synthesis is vectorised jnp so a whole CPI renders inside one jit,
and composes with the pulse-axis ICI sharding of rts_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RenderGrid:
    """Fast-time sampling of the receive window."""

    sample_rate: float  # complex baseband sample rate [Hz]
    num_samples: int  # fast-time samples per pulse
    window_start: float  # receive-window open time after pulse start [s]

    @property
    def times(self) -> np.ndarray:
        return self.window_start + np.arange(self.num_samples) / self.sample_rate


def synthesize_pulse(
    power,  # [K] response power gains (radar-equation product, no Pt)
    delay,  # [K] path delays [s]
    phase,  # [K] carrier phases [rad]
    doppler,  # [K] Doppler shifts [Hz]
    valid,  # [K] bool mask
    grid: RenderGrid,
    *,
    tx_power: float = 1.0,
    pulse_length: float = 1e-6,
    chirp_rate: float = 0.0,
    wave=None,  # RadarSignal — overrides pulse_length/chirp_rate (stored OK)
    xp=jnp,
):
    """Complex baseband fast-time samples [Ns] for one pulse.

    Default: rectangular envelope of ``pulse_length`` with optional LFM
    quadratic phase.  Passing ``wave`` uses its complex envelope instead
    — including STORED sampled waveforms (linear interpolation onto the
    grid).  Static shapes: every response lane contributes, masked lanes
    contribute zero.
    """
    ts = xp.asarray(grid.window_start) + xp.arange(grid.num_samples) / grid.sample_rate
    rel = ts[None, :] - delay[:, None]  # [K, Ns] time since path arrival
    volt = xp.sqrt(xp.maximum(power, 0.0) * tx_power)
    carrier_phs = xp.exp(1j * (phase[:, None] + 2.0 * xp.pi * doppler[:, None] * rel))
    if wave is not None:
        env = wave.envelope(rel, xp=xp)
    else:
        env = ((rel >= 0.0) & (rel < pulse_length)).astype(power.dtype)
        if chirp_rate:
            env = env * xp.exp(1j * (xp.pi * chirp_rate) * rel**2)
    contrib = volt[:, None] * env * carrier_phs
    contrib = xp.where(valid[:, None], contrib, 0.0)
    return contrib.sum(axis=0)


def waveform_replica(grid: RenderGrid, *, pulse_length: float = 1e-6, chirp_rate: float = 0.0, wave=None, xp=jnp):
    """Unit-amplitude transmit replica on the fast-time grid (delay 0)."""
    rel = xp.arange(grid.num_samples) / grid.sample_rate
    if wave is not None:
        return wave.envelope(rel, xp=xp)
    env = (rel < pulse_length).astype(xp.float32 if xp is jnp else float)
    phs = xp.pi * chirp_rate * rel**2
    return env * xp.exp(1j * phs)


def taylor_window(n: int, nbar: int = 4, sll_db: float = 35.0, xp=np):
    """Taylor taper: near-uniform aperture efficiency with the first
    ``nbar`` sidelobes held at -``sll_db`` dB (the standard radar range
    window).  Classic closed form (no scipy dependency in the image)."""
    a = np.arccosh(10.0 ** (sll_db / 20.0)) / np.pi
    sigma2 = nbar**2 / (a**2 + (nbar - 0.5) ** 2)
    m = np.arange(1, nbar)
    f = np.zeros(nbar - 1)
    for mi in range(1, nbar):
        num = np.prod(1.0 - (mi**2 / sigma2) / (a**2 + (m - 0.5) ** 2))
        den = np.prod([1.0 - mi**2 / k**2 for k in range(1, nbar) if k != mi])
        f[mi - 1] = ((-1) ** (mi + 1) * num) / (2.0 * den)
    x = (np.arange(n) - (n - 1) / 2.0) / n
    w = 1.0 + 2.0 * sum(f[mi - 1] * np.cos(2.0 * np.pi * mi * x) for mi in range(1, nbar))
    return xp.asarray(w / w.max())


def hamming_window(n: int, xp=np):
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return xp.asarray(w)


def _band_weighting(replica_np: np.ndarray, window: str, xp):
    """Frequency-domain sidelobe weighting over the replica's OWN band.

    The occupied band is detected from the replica's power spectrum (so
    the weighting is correct for any waveform convention — this library's
    LFM sweeps [0, B] at baseband, stored waveforms can sit anywhere):
    bins within -20 dB of the spectral peak, taken contiguous on the
    fftshifted axis, carry the taper; everything else is zeroed (the
    matched filter already bandlimits)."""
    n = replica_np.shape[-1]
    h = np.fft.fft(replica_np, n)
    mag2 = np.fft.fftshift(np.abs(h) ** 2)
    inband = mag2 >= mag2.max() * 1e-2  # -20 dB occupancy
    first, last = int(np.argmax(inband)), n - 1 - int(np.argmax(inband[::-1]))
    pos = np.clip((np.arange(n) - first) / max(last - first, 1), 0.0, 1.0)
    if window == "taylor":
        taper = np.interp(pos, np.linspace(0, 1, 4096), np.asarray(taylor_window(4096, xp=np)))
    elif window == "hamming":
        taper = 0.54 - 0.46 * np.cos(2.0 * np.pi * pos)
    else:
        raise ValueError(f"unknown range window {window!r}")
    w = np.zeros(n)
    w[first : last + 1] = taper[first : last + 1]
    return xp.asarray(np.fft.ifftshift(w))


def pulse_compress(samples, replica, xp=jnp, *, window: str | None = None,
                   sample_rate: float | None = None, bandwidth: float | None = None):
    """Matched filter along fast time via FFT correlation.

    ``samples``: [..., Ns]; output the same shape, peak at the path's
    leading-edge bin (circular correlation — the receive window must be
    long enough that wrap-around energy is out of the scene).

    ``window``: optional range-sidelobe taper ("taylor" or "hamming")
    applied across the replica's occupied band in the frequency domain;
    trades mainlobe width for the first sidelobes dropping from -13 dB
    (rect/LFM) to the taper's design level.  ``sample_rate``/``bandwidth``
    are accepted for API symmetry; the band itself is detected from the
    replica spectrum (correct for any waveform convention).
    """
    n = samples.shape[-1]
    s = xp.fft.fft(samples, axis=-1)
    h = xp.conj(xp.fft.fft(replica, n))
    if window is not None:
        h = h * _band_weighting(np.asarray(replica), window, xp)
    return xp.fft.ifft(s * h, axis=-1)


def synthesize_cpi(
    power,  # [P, K]
    delay,  # [P, K]
    phase,  # [P, K]
    doppler,  # [P, K]
    valid,  # [P, K]
    grid: RenderGrid,
    *,
    tx_power: float = 1.0,
    pulse_length: float = 1e-6,
    chirp_rate: float = 0.0,
    wave=None,
    xp=jnp,
):
    """Slow-time x fast-time matrix [P, Ns] for a CPI."""
    import jax

    def one(args):
        p, d, ph, f, v = args
        return synthesize_pulse(
            p, d, ph, f, v, grid, tx_power=tx_power, pulse_length=pulse_length,
            chirp_rate=chirp_rate, wave=wave, xp=xp,
        )

    if xp is jnp:
        return jax.vmap(lambda p, d, ph, f, v: synthesize_pulse(
            p, d, ph, f, v, grid, tx_power=tx_power, pulse_length=pulse_length,
            chirp_rate=chirp_rate, wave=wave, xp=xp,
        ))(power, delay, phase, doppler, valid)
    return np.stack([one(t) for t in zip(power, delay, phase, doppler, valid)])


BOLTZMANN = 1.380649e-23


def add_thermal_noise(samples, noise_temperature, bandwidth, key, xp=jnp):
    """Complex AWGN for a receiver noise temperature (the quantity each
    Response carries from Receiver.GetNoiseTemperature, ray_tracer.cpp:1318).

    Noise power = k_B * T * B per complex sample; ``key`` is a
    jax.random key (ignored for the NumPy path, which uses a Generator).
    """
    sigma = float(np.sqrt(BOLTZMANN * noise_temperature * bandwidth / 2.0))
    if xp is jnp:
        import jax

        k1, k2 = jax.random.split(key)
        noise = sigma * (
            jax.random.normal(k1, samples.shape) + 1j * jax.random.normal(k2, samples.shape)
        )
    else:
        rng = np.random.default_rng(key if isinstance(key, int) else 0)
        noise = sigma * (rng.standard_normal(samples.shape) + 1j * rng.standard_normal(samples.shape))
    return samples + noise


def range_doppler_map(cpi_samples, *, window: str = "hann", xp=jnp):
    """[P, Ns] slow/fast matrix -> [P, Ns] range-Doppler magnitude.

    FFT over slow time (pulse axis) with an optional window; Doppler bins
    are fftshifted so zero Doppler sits at row P//2.
    """
    p = cpi_samples.shape[0]
    if window == "hann":
        w = 0.5 - 0.5 * xp.cos(2.0 * xp.pi * xp.arange(p) / p)
    elif window == "rect":
        w = xp.ones((p,))
    else:
        raise ValueError(f"unknown window {window!r}")
    spec = xp.fft.fftshift(xp.fft.fft(cpi_samples * w[:, None], axis=0), axes=0)
    return xp.abs(spec)


def render_cpi_result(
    out,  # CpiResult from trace_cpi / trace_cpi_sharded
    rx_index: int,
    grid: RenderGrid,
    *,
    tx_power: float = 1.0,
    pulse_length: float = 1e-6,
    chirp_rate: float = 0.0,
    wave=None,
    compress: bool = False,
    range_window: str | None = None,
):
    """Render one receiver's range-Doppler map from a traced CPI.

    Uses the emit-masked unique-path lanes — the jit-friendly equivalent
    of looping over Response objects (ray_tracer.cpp:1290-1321).  All four
    quantities are the path-group aggregates: aggregation kernel 2 writes
    combined power/Doppler back into the results array the InterpPoint
    loop reads (aggregation.cu:89-93,169; ray_tracer.cpp:1310-1316).
    """
    valid = out.agg.emit & (out.received == rx_index)
    samples = synthesize_cpi(
        out.agg.power,
        out.agg.delay,
        out.agg.phase,
        out.agg.doppler,
        valid,
        grid,
        tx_power=tx_power,
        pulse_length=pulse_length,
        chirp_rate=chirp_rate,
        wave=wave,
    )
    if compress:
        replica = waveform_replica(grid, pulse_length=pulse_length, chirp_rate=chirp_rate, wave=wave)
        bw = wave.bandwidth if wave is not None else abs(chirp_rate) * pulse_length
        samples = pulse_compress(
            samples, replica, window=range_window,
            sample_rate=grid.sample_rate, bandwidth=bw,
        )
    return range_doppler_map(samples), samples


def responses_to_map(
    responses: Sequence,
    pulse_times: Sequence[float],
    grid: RenderGrid,
    *,
    tx_power: float = 1.0,
    pulse_length: float = 1e-6,
):
    """Render from host-side Response objects (driver path), NumPy."""
    p = len(pulse_times)
    k = max((len(r.points) for r in responses), default=0)
    arrs = {n: np.zeros((p, max(k, 1) * max(len(responses), 1))) for n in ("power", "delay", "phase", "doppler")}
    valid = np.zeros_like(arrs["power"], dtype=bool)
    t_index = {round(float(t), 12): i for i, t in enumerate(pulse_times)}
    counts = [0] * p
    for r in responses:
        for pt in r.points:
            i = t_index.get(round(pt.time - pt.delay, 12))
            if i is None:
                continue
            j = counts[i]
            counts[i] += 1
            arrs["power"][i, j] = pt.power
            arrs["delay"][i, j] = pt.delay
            arrs["phase"][i, j] = pt.phase
            arrs["doppler"][i, j] = pt.doppler
            valid[i, j] = True
    samples = synthesize_cpi(
        arrs["power"], arrs["delay"], arrs["phase"], arrs["doppler"], valid, grid,
        tx_power=tx_power, pulse_length=pulse_length, xp=np,
    )
    return range_doppler_map(samples, xp=np), samples
