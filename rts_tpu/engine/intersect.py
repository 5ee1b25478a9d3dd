"""Batched closest-hit search (the BVH+intersect stage, TPU-style).

The reference leans on OptiX's per-thread BVH traversal plus a
double-precision Möller–Trumbore test (triangle_mesh.cu:121-199).  On TPU
the idiomatic shape is a *wavefront*: all rays test triangle tiles
together, as dense matmuls.

Using triple-product identities, the reference's test

    n     = (p0-p2) x (p1-p0)
    denom = n . d
    t     = n . (p0 - o) / denom
    beta  = d . ((p0-o) x e1) / denom  =  [d.(p0 x e1) - (d x o).e1] / denom
    gamma = d . ((p0-o) x e0) / denom  =  [d.(p0 x e0) - (d x o).e0] / denom

becomes six [R,3] @ [3,T] contractions over per-ray vectors {o, d, d x o}
and precomputed per-triangle vectors {n, p0 x e1, p0 x e0, e1, e0} — no
[R,T,3] intermediates, MXU/VPU-friendly, identical accept/reject
semantics (padding triangles give denom = 0 -> NaN -> reject).

Triangles are processed in chunks with a ``lax.scan`` carrying the
running best hit, so VMEM/HBM footprint stays at [R, tri_chunk].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

RT_DEFAULT_MAX = 1e27  # OptiX RT_DEFAULT_MAX (float 1.e27f)


class HitResult(NamedTuple):
    t: jnp.ndarray  # [R] hit distance (engine dtype; +inf when no hit)
    tri: jnp.ndarray  # [R] int32 triangle index (valid only when found)
    beta: jnp.ndarray  # [R]
    gamma: jnp.ndarray  # [R]
    found: jnp.ndarray  # [R] bool
    # [10, R] winner shade fields (rows 0-8 base corner normals, row 9
    # target-as-float) when the clustered kernel ran with emit_shade —
    # exact copies of shade_pack[tri] for found lanes, zeros elsewhere;
    # None when the caller must gather instead (TraceConfig.shade_emit).
    shade: jnp.ndarray = None


def closest_hit_bruteforce(
    origin: jnp.ndarray,  # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    tmin: jnp.ndarray,  # [R] per-ray minimum segment length
    tri_p0,
    tri_e0,
    tri_e1,
    tri_n,
    tri_c1,
    tri_c0,
    tri_np0,
    *,
    tri_chunk: int = 512,
) -> HitResult:
    """Closest valid triangle per ray over the whole flat soup."""
    r = origin.shape[0]
    t_count = tri_p0.shape[0]
    dtype = origin.dtype

    chunk = min(tri_chunk, t_count)
    if t_count % chunk:
        # Pad with never-hit triangles (all-zero => denom 0 => reject).
        pad = chunk - t_count % chunk
        zpad3 = jnp.zeros((pad, 3), dtype)
        tri_p0 = jnp.concatenate([tri_p0, zpad3])
        tri_e0 = jnp.concatenate([tri_e0, zpad3])
        tri_e1 = jnp.concatenate([tri_e1, zpad3])
        tri_n = jnp.concatenate([tri_n, zpad3])
        tri_c1 = jnp.concatenate([tri_c1, zpad3])
        tri_c0 = jnp.concatenate([tri_c0, zpad3])
        tri_np0 = jnp.concatenate([tri_np0, jnp.zeros((pad,), dtype)])
        t_count += pad
    n_chunks = t_count // chunk

    def to_chunks(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    tris = jax.tree.map(
        to_chunks, (tri_p0, tri_e0, tri_e1, tri_n, tri_c1, tri_c0, tri_np0)
    )

    m = jnp.cross(direction, origin)  # [R, 3] — the (d x o) term

    def scan_body(carry, chunk_data):
        best_t, best_tri, best_beta, best_gamma, base = carry
        p0c, e0c, e1c, nc, c1c, c0c, np0c = chunk_data

        denom = direction @ nc.T  # [R, C]
        inv = 1.0 / denom
        t = (np0c[None, :] - origin @ nc.T) * inv
        beta = (direction @ c1c.T - m @ e1c.T) * inv
        gamma = (direction @ c0c.T - m @ e0c.T) * inv

        valid = (
            (t < RT_DEFAULT_MAX)
            & (t > tmin[:, None])
            & (beta >= 0.0)
            & (gamma >= 0.0)
            & (beta + gamma <= 1.0)
        )
        t_m = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_m, axis=1)  # first min within chunk
        rows = jnp.arange(r)
        tj = t_m[rows, j]
        better = tj < best_t  # strict: earlier chunk wins ties
        best_t = jnp.where(better, tj, best_t)
        best_tri = jnp.where(better, base + j.astype(jnp.int32), best_tri)
        best_beta = jnp.where(better, beta[rows, j], best_beta)
        best_gamma = jnp.where(better, gamma[rows, j], best_gamma)
        return (best_t, best_tri, best_beta, best_gamma, base + chunk), None

    init = (
        jnp.full((r,), jnp.inf, dtype),
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r,), dtype),
        jnp.zeros((r,), dtype),
        jnp.int32(0),
    )
    (best_t, best_tri, best_beta, best_gamma, _), _ = jax.lax.scan(scan_body, init, tris)
    found = jnp.isfinite(best_t)
    return HitResult(t=best_t, tri=best_tri, beta=best_beta, gamma=best_gamma, found=found)
