"""Radar cross-section models.

The reference calls an external ``Target::GetRCS(azAngleSum, elAngleSum,
wavelength)`` per recorded bounce (ray_tracer.cpp:1226) where the angle
arguments are the *sums* of the arrival and departure angles recorded by
the tracer ("half-angle approximation", ray_tracer.cpp:865 comment;
angles recorded at normal_shader.cu:259-265, 319-326).  The models
themselves live in the absent SOARS/FERS layer, so we define the family
here (SURVEY.md §2.3): every model is a jit-compatible callable
``rcs(az_sum, el_sum, wavelength) -> sigma`` operating on arrays.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class IsoRCS:
    """Aspect-independent RCS (sigma in m^2)."""

    # ``rcs()`` ignores its angle arguments; the tracer may skip
    # recording them when every target is aspect-free (TraceConfig
    # ``rcs_angles`` — prepare_cpi auto-detects via this attribute).
    aspect_free = True

    sigma: float = 1.0

    def rcs(self, az_sum, el_sum, wavelength):
        return jnp.full(jnp.shape(az_sum), self.sigma, dtype=jnp.result_type(az_sum))

    # reference-shaped alias
    def GetRCS(self, az_sum, el_sum, wavelength):  # noqa: N802
        return self.rcs(az_sum, el_sum, wavelength)


@dataclasses.dataclass(frozen=True)
class SphereRCS:
    """Optical-region conducting sphere: sigma = pi r^2, aspect-free."""

    aspect_free = True

    radius: float = 1.0

    def rcs(self, az_sum, el_sum, wavelength):
        import math

        return jnp.full(
            jnp.shape(az_sum), math.pi * self.radius**2, dtype=jnp.result_type(az_sum)
        )

    def GetRCS(self, az_sum, el_sum, wavelength):  # noqa: N802
        return self.rcs(az_sum, el_sum, wavelength)


@dataclasses.dataclass(frozen=True)
class PlateRCS:
    """Flat rectangular plate (physical optics): peak 4*pi*A^2/lambda^2 at
    specular, sinc^2 falloff with the bistatic half-angle off broadside."""

    width: float = 1.0
    height: float = 1.0

    def rcs(self, az_sum, el_sum, wavelength):
        a = self.width * self.height
        peak = 4.0 * jnp.pi * a**2 / wavelength**2
        # bistatic half-angles (the recorded sums are arrival+departure)
        haz = az_sum / 2.0
        hel = el_sum / 2.0
        xa = 2.0 * jnp.pi * self.width / wavelength * jnp.sin(haz)
        xe = 2.0 * jnp.pi * self.height / wavelength * jnp.sin(hel)

        def sinc(x):
            safe = jnp.where(jnp.abs(x) < 1e-9, 1.0, x)
            return jnp.where(jnp.abs(x) < 1e-9, 1.0, jnp.sin(safe) / safe)

        return peak * sinc(xa) ** 2 * sinc(xe) ** 2

    def GetRCS(self, az_sum, el_sum, wavelength):  # noqa: N802
        return self.rcs(az_sum, el_sum, wavelength)


@dataclasses.dataclass(frozen=True)
class TableRCS:
    """Bilinear interpolation over a (bistatic half-angle) az/el table.

    The lookup angle is half the recorded angle sum — the bisector
    direction of the arrival/departure pair.  Angles are wrapped into
    the table's periodic domain [-pi, pi) x [-pi/2, pi/2].
    """

    az_grid: tuple  # strictly increasing, radians
    el_grid: tuple
    table: tuple  # [n_el][n_az] sigma values

    @classmethod
    def from_arrays(cls, az_grid, el_grid, table) -> "TableRCS":
        az = np.asarray(az_grid, float)
        el = np.asarray(el_grid, float)
        tb = np.asarray(table, float)
        if tb.shape != (el.size, az.size):
            raise ValueError("table shape must be (n_el, n_az)")
        return cls(
            az_grid=tuple(az.tolist()),
            el_grid=tuple(el.tolist()),
            table=tuple(map(tuple, tb.tolist())),
        )

    def rcs(self, az_sum, el_sum, wavelength):
        az = jnp.asarray(self.az_grid)
        el = jnp.asarray(self.el_grid)
        tb = jnp.asarray(self.table)
        a = (jnp.asarray(az_sum) / 2.0 + jnp.pi) % (2 * jnp.pi) - jnp.pi
        e = jnp.clip(jnp.asarray(el_sum) / 2.0, el[0], el[-1])
        a = jnp.clip(a, az[0], az[-1])

        ia = jnp.clip(jnp.searchsorted(az, a) - 1, 0, az.size - 2)
        ie = jnp.clip(jnp.searchsorted(el, e) - 1, 0, el.size - 2)
        wa = (a - az[ia]) / (az[ia + 1] - az[ia])
        we = (e - el[ie]) / (el[ie + 1] - el[ie])
        v00 = tb[ie, ia]
        v01 = tb[ie, ia + 1]
        v10 = tb[ie + 1, ia]
        v11 = tb[ie + 1, ia + 1]
        return (
            v00 * (1 - wa) * (1 - we)
            + v01 * wa * (1 - we)
            + v10 * (1 - wa) * we
            + v11 * wa * we
        )

    def GetRCS(self, az_sum, el_sum, wavelength):  # noqa: N802
        return self.rcs(az_sum, el_sum, wavelength)
