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
    xp=jnp,
):
    """Complex baseband fast-time samples [Ns] for one pulse.

    Rectangular envelope of ``pulse_length``; nonzero ``chirp_rate`` adds
    the LFM quadratic phase exp(j*pi*k*rel^2) (pulse compression happens
    in ``pulse_compress``).  Static shapes: every response lane
    contributes, masked lanes contribute zero.
    """
    ts = xp.asarray(grid.window_start) + xp.arange(grid.num_samples) / grid.sample_rate
    rel = ts[None, :] - delay[:, None]  # [K, Ns] time since path arrival
    envelope = ((rel >= 0.0) & (rel < pulse_length)).astype(power.dtype)
    volt = xp.sqrt(xp.maximum(power, 0.0) * tx_power)
    phs = phase[:, None] + 2.0 * xp.pi * doppler[:, None] * rel
    if chirp_rate:
        phs = phs + xp.pi * chirp_rate * rel**2
    contrib = volt[:, None] * envelope * xp.exp(1j * phs)
    contrib = xp.where(valid[:, None], contrib, 0.0)
    return contrib.sum(axis=0)


def waveform_replica(grid: RenderGrid, *, pulse_length: float, chirp_rate: float = 0.0, xp=jnp):
    """Unit-amplitude transmit replica on the fast-time grid (delay 0)."""
    rel = xp.arange(grid.num_samples) / grid.sample_rate
    env = (rel < pulse_length).astype(xp.float32 if xp is jnp else float)
    phs = xp.pi * chirp_rate * rel**2
    return env * xp.exp(1j * phs)


def pulse_compress(samples, replica, xp=jnp):
    """Matched filter along fast time via FFT correlation.

    ``samples``: [..., Ns]; output the same shape, peak at the path's
    leading-edge bin (circular correlation — the receive window must be
    long enough that wrap-around energy is out of the scene).
    """
    n = samples.shape[-1]
    s = xp.fft.fft(samples, axis=-1)
    h = xp.conj(xp.fft.fft(replica, n))
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
    xp=jnp,
):
    """Slow-time x fast-time matrix [P, Ns] for a CPI."""
    import jax

    def one(args):
        p, d, ph, f, v = args
        return synthesize_pulse(
            p, d, ph, f, v, grid, tx_power=tx_power, pulse_length=pulse_length,
            chirp_rate=chirp_rate, xp=xp,
        )

    if xp is jnp:
        return jax.vmap(lambda p, d, ph, f, v: synthesize_pulse(
            p, d, ph, f, v, grid, tx_power=tx_power, pulse_length=pulse_length,
            chirp_rate=chirp_rate, xp=xp,
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
    compress: bool = False,
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
    )
    if compress:
        replica = waveform_replica(grid, pulse_length=pulse_length, chirp_rate=chirp_rate)
        samples = pulse_compress(samples, replica)
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
