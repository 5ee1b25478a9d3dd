"""Batched 3-vector math on ``[..., 3]`` arrays.

TPU-native equivalent of the per-thread double3 helpers the reference
duplicates in each .cu file (ray_tracer.cu:72-139, triangle_mesh.cu:39-118,
normal_shader.cu:48-124).  All functions are shape-polymorphic over leading
batch dimensions and dtype-preserving, so the same code runs in float32 on
TPU and float64 (with ``jax_enable_x64``) for oracle-parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot3(a, b):
    """Batched dot product over the trailing axis (dotd3)."""
    return jnp.sum(a * b, axis=-1)


def cross3(a, b):
    """Batched cross product (crossd3)."""
    return jnp.cross(a, b)


def mag_squared3(a):
    """Squared magnitude (magsquared3)."""
    return jnp.sum(a * a, axis=-1)


def length3(a):
    """Euclidean length (lengthd3)."""
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize3(a):
    """Unit vector (normalised3).  Divides by the exact norm, no epsilon,
    matching the reference (a zero vector yields NaNs there too)."""
    return a / length3(a)[..., None]


# --- components-major ("lanes-last") variants -------------------------------
# The TPU engine stores batched vectors as [3, L] (components on the
# LEADING axis): XLA:TPU tiles the two minor dims to (8, 128), so a
# [L, 3] array pads its lane dim 3 -> 128 and every materialisation
# (loop carries, fusion boundaries, kernel operands) moves ~42x the
# logical bytes.  [3, L] pads only 3 -> 8 sublanes.  Measured: the
# whole-kernel-deleted Pallas floor and the ~6 ms/segment hit-body block
# were both this padding (docs/PERF.md r3q).  The [..., 3] helpers above
# stay for the oracle / host-side NumPy code.


def dot3c(a, b):
    """Dot product over the LEADING component axis ([3, ...] layout)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def length3c(a):
    return jnp.sqrt(dot3c(a, a))


def normalize3c(a):
    """Unit vector over the leading component axis (exact norm, no eps)."""
    return a / length3c(a)[None]


def cross3c(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def sph_to_cart(azi, ele):
    """Spherical (azimuth, elevation) to unit Cartesian (ray_tracer.cu:132-139).

    x = cos(azi)cos(ele), y = sin(azi)cos(ele), z = sin(ele).
    """
    ce = jnp.cos(ele)
    return jnp.stack([jnp.cos(azi) * ce, jnp.sin(azi) * ce, jnp.sin(ele)], axis=-1)


def cart_to_sph(v):
    """Cartesian to (azimuth, elevation) pair (normal_shader.cu:117-124).

    Returns ``(..., 2)`` with azi = atan2(y, x), ele = atan2(z, hypot(x, y)).
    """
    azi = jnp.arctan2(v[..., 1], v[..., 0])
    ele = jnp.arctan2(v[..., 2], jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2))
    return jnp.stack([azi, ele], axis=-1)


def reflect3(i, n):
    """Specular reflection of direction ``i`` about normal ``n``.

    Matches OptiX ``reflect`` used at normal_shader.cu:296:
    ``r = i - 2 n (n . i)`` (insensitive to the sign of ``n``).
    """
    return i - 2.0 * n * dot3(i, n)[..., None]


def refract3(i, n, ior):
    """Snell refraction with OptiX ``refract`` semantics (normal_shader.cu:212).

    ``i`` is the (unit) incident direction, ``n`` the surface normal, and
    ``ior`` the index ratio n2/n1 passed by the caller.  OptiX flips the
    normal and uses ``eta = ior`` when the ray travels along the normal
    (back-face), else ``eta = 1/ior``.

    Returns ``(direction, ok)`` where ``ok`` is False on total internal
    reflection (direction is zeros there, as in OptiX).
    """
    ndotv = dot3(i, n)
    backface = ndotv > 0.0
    eta = jnp.where(backface, ior, 1.0 / ior)
    nn = jnp.where(backface[..., None], -n, n)
    neg_ndotv = jnp.where(backface, -ndotv, ndotv)
    k = 1.0 - eta * eta * (1.0 - neg_ndotv * neg_ndotv)
    ok = k >= 0.0
    k_safe = jnp.where(ok, k, 0.0)
    r = eta[..., None] * i - (eta * neg_ndotv + jnp.sqrt(k_safe))[..., None] * nn
    r = jnp.where(ok[..., None], normalize3(r), jnp.zeros_like(r))
    return r, ok


def triangle_area(p1, p2, p3):
    """Heron's-formula triangle area (C2 host util, ray_tracer.cpp:104-116;
    the reference keeps it for a commented-out mesh statistic at :196)."""
    import numpy as np

    a = np.linalg.norm(np.subtract(p2, p1))
    b = np.linalg.norm(np.subtract(p3, p2))
    c = np.linalg.norm(np.subtract(p1, p3))
    s = (a + b + c) / 2.0
    return float(np.sqrt(max(s * (s - a) * (s - b) * (s - c), 0.0)))


def wrap_angle(angle):
    """Normalise an angle to (-pi, pi] like the while-loops at
    ray_tracer.cu:53-57.  (Behaviour at exactly +/-pi is measure-zero and
    may differ in the last ulp.)"""
    two_pi = 2.0 * jnp.pi
    return angle - two_pi * jnp.floor((angle + jnp.pi) / two_pi)


def angle_in_range(test, a, b):
    """Circular interval membership test (ray_tracer.cu:60-69).

    True iff ``test`` lies strictly between ``a`` and ``b`` going the short
    way around the circle.
    """
    a = wrap_angle(a - test)
    b = wrap_angle(b - test)
    return (a * b < 0.0) & (jnp.abs(a - b) < jnp.pi)
