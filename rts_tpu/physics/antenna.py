"""Antenna gain patterns.

The reference calls external ``GetGain(direction, rotation, wavelength)``
on transmitters and receivers (ray_tracer.cpp:1233-1235); the pattern
family lives in the absent SOARS/FERS layer, so we provide it
(SURVEY.md §2.3).  Every model is a jit-compatible callable

    gain(az, el, bore_az, bore_el, wavelength) -> linear gain

with (az, el) the spherical angles of the evaluation direction and
(bore_az, bore_el) the antenna boresight; arrays broadcast.

``off_angle`` is the great-circle angle between direction and boresight.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def off_angle(az, el, bore_az, bore_el):
    """Great-circle angle between (az, el) and (bore_az, bore_el)."""
    c = jnp.cos(el) * jnp.cos(bore_el) * jnp.cos(az - bore_az) + jnp.sin(el) * jnp.sin(bore_el)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


@dataclasses.dataclass(frozen=True)
class IsotropicAntenna:
    def gain(self, az, el, bore_az, bore_el, wavelength):
        return jnp.ones(jnp.broadcast_shapes(jnp.shape(az), jnp.shape(bore_az)), dtype=jnp.result_type(az))


@dataclasses.dataclass(frozen=True)
class SincAntenna:
    """G(theta) = alpha * |sinc(beta * theta)|^gamma (FERS 'sinc')."""

    alpha: float = 1.0
    beta: float = 1.0
    gamma: float = 2.0

    def gain(self, az, el, bore_az, bore_el, wavelength):
        th = off_angle(az, el, bore_az, bore_el)
        x = self.beta * th
        s = jnp.where(jnp.abs(x) < 1e-12, 1.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-12, 1.0, x))
        return self.alpha * jnp.abs(s) ** self.gamma


@dataclasses.dataclass(frozen=True)
class GaussianAntenna:
    """G = exp(-(d_az^2 * az_scale + d_el^2 * el_scale)) (FERS 'gaussian')."""

    az_scale: float = 1.0
    el_scale: float = 1.0

    def gain(self, az, el, bore_az, bore_el, wavelength):
        daz = _wrap(az - bore_az)
        dele = el - bore_el
        return jnp.exp(-(daz**2 * self.az_scale + dele**2 * self.el_scale))


@dataclasses.dataclass(frozen=True)
class SquareHornAntenna:
    """Square aperture horn: G0 * sinc^2 of the projected angle, with
    G0 = 4*pi*d^2/lambda^2 (FERS 'squarehorn')."""

    dimension: float = 1.0  # aperture edge length [m]

    def gain(self, az, el, bore_az, bore_el, wavelength):
        th = off_angle(az, el, bore_az, bore_el)
        ge = 4.0 * jnp.pi * self.dimension**2 / wavelength**2
        x = jnp.pi * self.dimension / wavelength * jnp.sin(th)
        s = jnp.where(jnp.abs(x) < 1e-12, 1.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-12, 1.0, x))
        return ge * s**2


def _j1(x):
    """Bessel J1 via the Abramowitz & Stegun 9.4 rational approximations
    (|err| < 1e-7 relative to scipy) — keeps the parabolic model
    jit-compatible without scipy."""
    ax = jnp.abs(x)
    small = ax < 3.0
    t = (x / 3.0) ** 2
    p_small = x * (
        0.5
        + t
        * (
            -0.56249985
            + t * (0.21093573 + t * (-0.03954289 + t * (0.00443319 + t * (-0.00031761 + t * 0.00001109))))
        )
    )
    ax_safe = jnp.where(small, 3.0, ax)
    u = 3.0 / ax_safe
    f1 = 0.79788456 + u * (
        0.00000156 + u * (0.01659667 + u * (0.00017105 + u * (-0.00249511 + u * (0.00113653 - u * 0.00020033))))
    )
    th = ax_safe - 2.35619449 + u * (
        0.12499612 + u * (0.00005650 + u * (-0.00637879 + u * (0.00074348 + u * (0.00079824 - u * 0.00029166))))
    )
    p_big = jnp.sign(x) * f1 * jnp.cos(th) / jnp.sqrt(ax_safe)
    return jnp.where(small, p_small, p_big)


@dataclasses.dataclass(frozen=True)
class ParabolicAntenna:
    """Circular parabolic dish: G = G0 * (2 J1(x)/x)^2,
    x = pi*d*sin(theta)/lambda, G0 = (pi*d/lambda)^2 (FERS 'parabolic')."""

    diameter: float = 1.0

    def gain(self, az, el, bore_az, bore_el, wavelength):
        th = off_angle(az, el, bore_az, bore_el)
        g0 = (jnp.pi * self.diameter / wavelength) ** 2
        x = jnp.pi * self.diameter * jnp.sin(th) / wavelength
        safe = jnp.abs(x) > 1e-8
        x_s = jnp.where(safe, x, 1.0)
        pat = jnp.where(safe, 2.0 * _j1(x_s) / x_s, 1.0)
        return g0 * pat**2


@dataclasses.dataclass(frozen=True)
class TableAntenna:
    """Gain from a 1-D off-angle table (linear interpolation)."""

    angles: tuple  # increasing, radians, starting at 0
    gains: tuple

    def gain(self, az, el, bore_az, bore_el, wavelength):
        th = off_angle(az, el, bore_az, bore_el)
        return jnp.interp(th, jnp.asarray(self.angles), jnp.asarray(self.gains))
