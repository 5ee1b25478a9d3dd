"""Launch-fan generation (jit-friendly).

Vectorised equivalent of the per-thread direction computation in the ray
generation program (ray_tracer.cu:144-209): a Cartesian-interpolated
N x N x N grid between the beam-corner unit vectors, azimuth rotation
about z, then elevation rotation about the azimuth-rotated y axis using
the reversed-sine axis-angle matrix.  Ray order matches
``rayIndex = iz*N^2 + iy*N + ix`` (ray_tracer.cu:151).
"""

from __future__ import annotations

import jax.numpy as jnp

from rts_tpu.core.rotation import rot_axis_reversed, rot_z
from rts_tpu.core.vec import normalize3, sph_to_cart


def generate_fan(num_rays: int, tx_dir, tx_span, dtype=jnp.float32):
    """Primary ray directions [N^3, 3].

    ``tx_dir`` = (azimuth, elevation) boresight; ``tx_span`` = (azimuth
    span, elevation span, launch range).  The returned directions are the
    double3-analogue the tracer propagates (unnormalised after the
    elevation rotation, matching ray_tracer.cu:203).
    """
    az = jnp.asarray(tx_dir[0], dtype)
    el = jnp.asarray(tx_dir[1], dtype)
    n = num_rays

    if n == 1:
        return sph_to_cart(az, el)[None, :]

    az_span = jnp.asarray(tx_span[0], dtype)
    el_span = jnp.asarray(tx_span[1], dtype)
    launch_range = jnp.asarray(tx_span[2], dtype)

    beam_start = sph_to_cart(-az_span / 2, -el_span / 2)
    beam_end = sph_to_cart(az_span / 2, el_span / 2)

    idx = jnp.arange(n, dtype=dtype)
    dx = beam_start[0] + ((beam_end[0] * (1 + launch_range)) - beam_start[0]) / (n - 1) * idx
    dy = beam_start[1] + (beam_end[1] - beam_start[1]) / (n - 1) * idx
    dz = beam_start[2] + (beam_end[2] - beam_start[2]) / (n - 1) * idx

    d = jnp.stack(
        jnp.broadcast_arrays(dx[None, None, :], dy[None, :, None], dz[:, None, None]),
        axis=-1,
    ).reshape(-1, 3)
    d = normalize3(d)

    rz = rot_z(az, xp=jnp)
    d = normalize3(d @ rz.T)
    orth = normalize3(rz[:, 1])
    r1 = rot_axis_reversed(orth, el, xp=jnp)
    return d @ r1.T  # not renormalised (ray_tracer.cu:203)
