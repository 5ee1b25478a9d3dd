"""Decompose the ~6.5 ms/pulse/segment of wavefront shading (seg1,
63^3): gathers vs normal interpolation vs scatter/record vs state merge.

Each stage is an isolated jit over the SAME fixed post-kernel inputs
(hit result captured once, outside the timed region), so stage times
are directly comparable; the `full` stage is the real _process_miss +
_process_hit body.

Run alone (the axon tunnel serialises TPU processes).
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B

ap = argparse.ArgumentParser()
ap.add_argument("--cluster-size", type=int, default=128)
ap.add_argument("--candidates", type=int, default=64)
ap.add_argument("--mt-group", type=int, default=8)
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--sub-tiles", type=int, default=8)
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=63)
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=args.cluster_size,
    ray_tile=args.ray_tile, candidates=args.candidates, sub_tiles=args.sub_tiles,
    mt_group=args.mt_group, mt_union=True, cand_order="near",
    fan_order="raster", refine=False, replay_cap=16384,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses
print(f"# cs={args.cluster_size} cand={args.candidates} G={args.mt_group} n={args.rays}",
      file=sys.stderr)

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import (
    TraceBuffers, _init_state, _process_hit, _process_miss, _scatter_col,
)
from rts_tpu.core.vec import dot3, normalize3
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)

state0 = _init_state(cfg, batch.tx_origin[0], fan0, jnp.float32)
hit0 = closest_hit_clustered(
    state0.origin, state0.direction, state0.tmin, sc0.tri_pack, sc0.aabb_mn,
    sc0.aabb_mx, batch.tx_origin[0], cluster_size=cfg.cluster_size,
    ray_tile=cfg.ray_tile, group_size=cfg.group_size, super_size=cfg.super_size,
    sub_tiles=cfg.sub_tiles, candidates=cfg.candidates, mt_group=cfg.mt_group,
)
hit0 = jax.tree.map(jax.block_until_ready, hit0)
print(f"# seg1 hits: {int(hit0.found.sum())} of {l}", file=sys.stderr)


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.2f} ms/pulse")
    return best / P


def mk_bufs():
    return TraceBuffers(
        path=jnp.full((cfg.ray_total, cfg.depth_total), -1, jnp.int32),
        rcs=jnp.full((cfg.ray_total, cfg.depth_total, 2), -1000000.0, jnp.float32),
    )


def ptb(i):
    return state0._replace(tmin=state0.tmin + i * 1e-12)


@jax.jit
def s_gathers():
    def f(i):
        s = ptb(i)
        tri = jnp.clip(hit0.tri, 0, sc0.tri_target.shape[0] - 1) + jnp.int32(0 * i)
        targ = sc0.tri_target[tri]
        cn = sc0.base_corner_normals[tri]
        return jnp.sum(targ) + jnp.sum(cn) + jnp.sum(s.tmin)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_gather_fused():
    def f(i):
        tri = jnp.clip(hit0.tri, 0, sc0.tri_target.shape[0] - 1) + jnp.int32(0 * i)
        shade = sc0.shade_pack[tri]
        return jnp.sum(shade)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_normals():
    def f(i):
        s = ptb(i)
        tri = jnp.clip(hit0.tri, 0, sc0.tri_target.shape[0] - 1) + jnp.int32(0 * i)
        targ = jnp.clip(sc0.tri_target[tri], 0, sc0.target_refl.shape[0] - 1)
        cn = sc0.base_corner_normals[tri]
        nrm_b = (cn[:, 1] * hit0.beta[:, None] + cn[:, 2] * hit0.gamma[:, None]
                 + cn[:, 0] * (1.0 - hit0.beta - hit0.gamma)[:, None])
        oh = (targ[:, None] == jnp.arange(sc0.target_refl.shape[0], dtype=jnp.int32)[None, :]).astype(jnp.float32)
        r9 = jnp.matmul(oh, sc0.rot.reshape(-1, 9), precision=jax.lax.Precision.HIGHEST)
        nrm = jnp.stack([
            r9[:, 0] * nrm_b[:, 0] + r9[:, 1] * nrm_b[:, 1] + r9[:, 2] * nrm_b[:, 2],
            r9[:, 3] * nrm_b[:, 0] + r9[:, 4] * nrm_b[:, 1] + r9[:, 5] * nrm_b[:, 2],
            r9[:, 6] * nrm_b[:, 0] + r9[:, 7] * nrm_b[:, 1] + r9[:, 8] * nrm_b[:, 2],
        ], axis=-1)
        nrm = normalize3(nrm)
        return jnp.sum(nrm) + jnp.sum(s.tmin)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_records():
    def f(i):
        s = ptb(i)
        tri = jnp.clip(hit0.tri, 0, sc0.tri_target.shape[0] - 1) + jnp.int32(0 * i)
        targ = jnp.clip(sc0.tri_target[tri], 0, sc0.target_refl.shape[0] - 1)
        bufs = mk_bufs()
        gate = s.active & hit0.found
        col = s.refl_depth + s.refr_depth
        path = bufs.path.at[:l].set(_scatter_col(bufs.path[:l], col, targ, gate))
        rcs_val = jnp.stack([hit0.beta, hit0.gamma], axis=-1)
        rcs = bufs.rcs.at[:l].set(_scatter_col(bufs.rcs[:l], col, rcs_val, gate))
        tri_seq = _scatter_col(s.tri_seq, col, tri, gate)
        return jnp.sum(path) + jnp.sum(rcs) + jnp.sum(tri_seq)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_miss():
    def f(i):
        s = ptb(i)
        mm = s.active & ~hit0.found
        s2 = _process_miss(s, mm, rxg0, batch.tx_origin[0], cfg)
        return jnp.sum(s2.power) + jnp.sum(s2.received)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_full():
    def f(i):
        s = ptb(i)
        hm = s.active & hit0.found
        mm = s.active & ~hit0.found
        s2 = _process_miss(s, mm, rxg0, batch.tx_origin[0], cfg)
        s3, b3 = _process_hit(s2, mk_bufs(), hit0, hm, sc0, batch.tx_origin[0], cfg, l)
        return jnp.sum(s3.power) + jnp.sum(s3.origin) + jnp.sum(b3.rcs)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_sph():
    # transcendental share: 2x cart_to_sph2 (atan2 + asin) + normalize,
    # as the reflection path does per segment
    from rts_tpu.engine.wavefront import _cart_to_sph2

    def f(i):
        s = ptb(i)
        k0 = normalize3(s.direction + i * 0.0)
        a0, e0 = _cart_to_sph2(k0)
        a1, e1 = _cart_to_sph2(-k0)
        return jnp.sum(a0 + e0 + a1 + e1) + jnp.sum(s.tmin)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_merge():
    # the final where-merge over every LaneState field
    def f(i):
        s = ptb(i)
        hm = s.active & hit0.found
        def bm(m, a):
            return m[:, None] if a.ndim == 2 else m
        s2 = s._replace(power=s.power * 1.0001, tmin=s.tmin + 1e-7)
        merged = jax.tree.map(lambda a, b: jnp.where(bm(hm, a), a, b), s2, s)
        return jnp.sum(merged.power) + jnp.sum(merged.origin)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


# ---- candidate-window MXU extraction: the structured alternative to the
# plain [T, F] row gather.  Per ray tile, the winning tri lies in one of
# ~13 candidate clusters; extracting shade rows as a one-hot [rt, Kx*cs]
# MXU contraction against just those clusters' rows turns 250k random
# 40 B reads into a few block reads + a tiny matmul.  Candidate lists are
# PREP (built host-side from the actual winners; phase 1 already provides
# them in the real pipeline).
cs_x = args.cluster_size
K_x = 16
F_x = 10
tri_np = np.asarray(jnp.clip(hit0.tri, 0, sc0.tri_target.shape[0] - 1))
Lt = (l // args.ray_tile) * args.ray_tile
tiles_x = Lt // args.ray_tile
w_cl = (tri_np[:Lt] // cs_x).reshape(tiles_x, args.ray_tile)
cand_np = np.zeros((tiles_x, K_x), np.int32)
for t in range(tiles_x):
    u = np.unique(w_cl[t])[:K_x]
    cand_np[t, : len(u)] = u
    if len(u) < K_x:
        cand_np[t, len(u):] = u[-1] if len(u) else 0
cand_x = jnp.asarray(cand_np)
C_x = (sc0.shade_pack.shape[0] + cs_x - 1) // cs_x
pad_rows = C_x * cs_x - sc0.shade_pack.shape[0]
shade_rows = jnp.pad(sc0.shade_pack, ((0, pad_rows), (0, 0))).reshape(C_x, cs_x, F_x)
tri_t = jnp.asarray(tri_np[:Lt]).reshape(tiles_x, args.ray_tile)
CH = 61 if tiles_x % 61 == 0 else 1
assert tiles_x % CH == 0, tiles_x


@jax.jit
def s_gather_mxu():
    def f(i):
        tri3 = tri_t + jnp.int32(0 * i)
        wcl = tri3 // cs_x  # [tiles, rt]
        # slot of the winning cluster in the tile's candidate list
        match = cand_x[:, None, :] == wcl[:, :, None]  # [tiles, rt, Kx]
        k = jnp.argmax(match, axis=-1)  # [tiles, rt]
        col = k * cs_x + (tri3 % cs_x)  # [tiles, rt]
        rows = shade_rows[cand_x]  # [tiles, Kx, cs, F] block gather
        rows2 = rows.reshape(tiles_x, K_x * cs_x, F_x)

        def chunk(c):
            colc, rowc = c
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (CH, args.ray_tile, K_x * cs_x), 2)
                == colc[:, :, None]
            ).astype(jnp.float32)
            return jnp.einsum(
                "trc,tcf->trf", oh, rowc, precision=jax.lax.Precision.HIGHEST
            )

        out = jax.lax.map(
            chunk,
            (
                col.reshape(-1, CH, args.ray_tile),
                rows2.reshape(-1, CH, K_x * cs_x, F_x),
            ),
        )
        return jnp.sum(out)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


# ---- [T, 16] row-major MT-field gather + beta/gamma recompute: the
# outside-the-kernel cost of thinning the Pallas epilogue to (t, tri)
# only (drop in-loop one-hot barycentric extraction).
hit_rows = jnp.transpose(sc0.tri_pack)  # [Tp, 16] row-contiguous


@jax.jit
def s_gather16():
    def f(i):
        s = ptb(i)
        tri = jnp.clip(hit0.tri, 0, hit_rows.shape[0] - 1) + jnp.int32(0 * i)
        rows = hit_rows[tri]  # [L, 16]
        o, d = s.origin, s.direction
        m = jnp.stack([
            d[:, 1] * o[:, 2] - d[:, 2] * o[:, 1],
            d[:, 2] * o[:, 0] - d[:, 0] * o[:, 2],
            d[:, 0] * o[:, 1] - d[:, 1] * o[:, 0],
        ], axis=-1)
        dsum = lambda a, f0: a[:, 0] * rows[:, f0] + a[:, 1] * rows[:, f0 + 1] + a[:, 2] * rows[:, f0 + 2]
        denom = dsum(d, 0)
        inv = 1.0 / denom
        beta = (dsum(d, 3) - dsum(m, 9)) * inv
        gamma = (dsum(d, 6) - dsum(m, 12)) * inv
        return jnp.sum(beta) + jnp.sum(gamma)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


from rts_tpu.engine.shade_gather import shade_rows_window


@jax.jit
def s_gather_window():
    # the PRODUCTION winner-window path (engine/shade_gather.py): on-
    # device list build (sort+scatter) + block gather + one-hot MXU
    def f(i):
        tri = jnp.clip(hit0.tri, 0, sc0.shade_pack.shape[0] - 1) + jnp.int32(0 * i)
        rows, ovf = shade_rows_window(sc0.shade_pack, tri, args.ray_tile, args.cluster_size)
        return jnp.sum(rows) + ovf.astype(jnp.float32)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def s_gather_smalltab():
    # winner-window block gather, then per-tile take_along_axis from the
    # small [kw*cs, F] per-tile table — separates gather-ADDRESS cost
    # (unchanged) from table-SIZE cost (40 MB -> 80 KB per tile)
    def f(i):
        tri3 = tri_t + jnp.int32(0 * i)
        wcl = tri3 // cs_x
        match = cand_x[:, None, :] == wcl[:, :, None]
        k = jnp.argmax(match, axis=-1)
        col = k * cs_x + (tri3 % cs_x)  # [tiles, rt]
        rows = shade_rows[cand_x].reshape(tiles_x, K_x * cs_x, F_x)
        out = jnp.take_along_axis(rows, col[:, :, None], axis=1)
        return jnp.sum(out)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


timed("gathers (targ + corner normals, split)", s_gathers)
timed("gather via candidate-window MXU one-hot", s_gather_mxu)
timed("gather via winner-window (production path)", s_gather_window)
timed("gather via small per-tile table (take_along)", s_gather_smalltab)
timed("gather16 (hit-table rows + beta/gamma recompute)", s_gather16)
timed("gather (fused shade_pack)", s_gather_fused)
timed("normals (gathers + interp + rot + norm)", s_normals)
timed("records (path/rcs/tri_seq scatter_col)", s_records)
timed("sph (2x cart_to_sph2 + normalize)", s_sph)
timed("merge (state-wide where over hit mask)", s_merge)
timed("miss only", s_miss)
timed("full hit+miss shading", s_full)
print("SHADPROF2 DONE")
