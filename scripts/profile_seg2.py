"""Decompose the bounce-1 (segment-2) marginal cost on the TPU.

r3h measured seg-2 marginal (kernel+shading) at 27.2 ms/pulse vs seg-1's
21.4 even though the offline gating model says bounce-1 needs FEWER MT
pairs (1040 vs 1192 union pairs/ray, docs/PERF.md).  Hypothesis: bounce
origins scatter within each ray tile, so the per-TILE candidate union
fattens — more candidates/tile means more DMA traffic and more G-wide
windows (each mostly padding), which the pairs/ray model does not see.

Stages: seg1 full body, +seg2 kernel only, +seg2 full body — the
differences isolate seg2 kernel vs seg2 shading.  Then phase-1 list
stats (candidates/tile, windows/tile at G, overflow) for seg-1 vs seg-2
inputs, host-read from one pulse.

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
G = args.mt_group
print(f"# cs={args.cluster_size} cand={args.candidates} G={G} "
      f"rt={args.ray_tile} st={args.sub_tiles} n={args.rays}", file=sys.stderr)

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import TraceBuffers, _init_state, _process_hit, _process_miss
from rts_tpu.ops import closest_hit_clustered
from rts_tpu.ops.cluster_trace import _tile_candidates

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)


def timed(name, fn, *a, n=3):
    out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.2f} ms/pulse")
    return best / P


def hit_only(state):
    live = jnp.where(state.active[:, None], state.direction, 0.0)
    return closest_hit_clustered(
        state.origin, live, state.tmin, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx,
        batch.tx_origin[0], cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
        group_size=cfg.group_size, super_size=cfg.super_size,
        sub_tiles=cfg.sub_tiles, candidates=cfg.candidates, mt_group=cfg.mt_group,
    )


def seg_body(state, bufs):
    hit = hit_only(state)
    hm = state.active & hit.found
    mm = state.active & ~hit.found
    state = _process_miss(state, mm, rxg0, batch.tx_origin[0], cfg)
    state, bufs = _process_hit(state, bufs, hit, hm, sc0, batch.tx_origin[0], cfg, l)
    return state, bufs


def perturb(state, i):
    return state._replace(tmin=state.tmin + i * 1e-12)


def mk_bufs():
    return TraceBuffers(
        path=jnp.full((cfg.ray_total, cfg.depth_total), -1, jnp.int32),
        rcs=jnp.full((cfg.ray_total, cfg.depth_total, 2), -1000000.0, jnp.float32),
    )


@jax.jit
def stage_s1():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        s2, b2 = seg_body(s, mk_bufs())
        return jnp.sum(s2.power) + jnp.sum(s2.origin) + jnp.sum(b2.rcs)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def stage_s1_k2():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        s2, b2 = seg_body(s, mk_bufs())
        h = hit_only(s2)
        return (jnp.sum(s2.power) + jnp.sum(s2.origin) + jnp.sum(b2.rcs)
                + jnp.sum(h.t) + jnp.sum(h.tri))
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def stage_s1_s2():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        s2, b2 = seg_body(s, mk_bufs())
        s3, b3 = seg_body(s2, b2)
        return jnp.sum(s3.power) + jnp.sum(s3.origin) + jnp.sum(b3.rcs)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


a = timed("seg1 full body", stage_s1)
b = timed("seg1 + seg2 kernel only", stage_s1_k2)
print(f"#   seg2 kernel marginal: {(b - a) * 1000:.2f} ms/pulse")
c = timed("seg1 + seg2 full", stage_s1_s2)
print(f"#   seg2 shading marginal: {(c - b) * 1000:.2f} ms/pulse")

# --- phase-1 list statistics, seg-1 vs seg-2 inputs (one pulse) -------
def p1_stats(tag, origin, direction, tmin):
    cand, meta, bits, *_ = _tile_candidates(
        origin, direction, tmin, sc0.aabb_mn, sc0.aabb_mx,
        cfg.ray_tile, cfg.sub_tiles, cfg.candidates,
        cand_order=cfg.cand_order, p1_fanout=cfg.p1_fanout,
        p1_super_k=cfg.p1_super_k, p1_fanout0=cfg.p1_fanout0,
        p1_super_k0=cfg.p1_super_k0,
    )
    n = np.asarray(meta[:, 0])
    ovf = np.asarray(meta[:, 1])
    bits_np = np.asarray(bits)
    # gated sub-blocks per tile: popcount of the OR over each G-window
    wins = np.zeros(n.shape, np.int64)
    gated = np.zeros(n.shape, np.int64)
    for t in range(n.shape[0]):
        k = int(n[t])
        for w0 in range(0, k, G):
            u = 0
            for q in range(w0, min(w0 + G, cfg.candidates)):
                u |= int(bits_np[t, q])
            wins[t] += 1
            gated[t] += bin(u & 0xFF).count("1")
    print(f"{tag}: cand/tile mean {n.mean():.1f} max {n.max()}, "
          f"overflow {int(ovf.sum())}, windows/tile {wins.mean():.2f}, "
          f"gated blocks/tile {gated.mean():.2f}, "
          f"DMA bytes/tile {n.mean() * 16 * args.cluster_size * 4 / 1024:.0f} KB")


s0 = _init_state(cfg, batch.tx_origin[0], fan0.T, jnp.float32)  # [3, F] engine layout
s1, b1 = seg_body(s0, mk_bufs())
live0 = jnp.where(s0.active[:, None], s0.direction, 0.0)
live1 = jnp.where(s1.active[:, None], s1.direction, 0.0)
print(f"# seg2 live lanes: {int(np.asarray(s1.active).sum())} of {l}")
p1_stats("seg1 phase-1", s0.origin, live0, s0.tmin)
p1_stats("seg2 phase-1", s1.origin, live1, s1.tmin)
print("SEG2PROF DONE")
