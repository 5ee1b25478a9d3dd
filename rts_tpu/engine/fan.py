"""Launch-fan generation (jit-friendly).

Vectorised equivalent of the per-thread direction computation in the ray
generation program (ray_tracer.cu:144-209): a Cartesian-interpolated
N x N x N grid between the beam-corner unit vectors, azimuth rotation
about z, then elevation rotation about the azimuth-rotated y axis using
the reversed-sine axis-angle matrix.  Ray order matches
``rayIndex = iz*N^2 + iy*N + ix`` (ray_tracer.cu:151).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from rts_tpu.core.rotation import rot_axis_reversed, rot_z
from rts_tpu.core.vec import normalize3, sph_to_cart


@functools.lru_cache(maxsize=32)
def fan_tile_perm(num_rays: int) -> np.ndarray:
    """Morton permutation of the N^3 fan indices.

    The natural launch order (rayIndex = iz*N^2 + iy*N + ix,
    ray_tracer.cu:151) makes a 256-ray tile a long thin angular strip;
    Morton order makes it a compact patch, so each traversal tile's
    frustum overlaps far fewer clusters.  Results are inverse-permuted
    back to the reference launch order after tracing (bit-identical —
    each ray's chain is independent of tile membership).
    """
    n = num_rays
    iz, iy, ix = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")

    def spread(v):
        v = v.astype(np.uint64)
        v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
        v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
        v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
        v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
        return v

    code = (spread(iz.ravel()) << np.uint64(2)) | (spread(iy.ravel()) << np.uint64(1)) | spread(ix.ravel())
    return np.argsort(code, kind="stable")


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
