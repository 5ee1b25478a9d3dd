"""Honest per-segment marginal costs on the TPU (fixes profile_seg2).

profile_seg2's stages consumed only a few state fields, so XLA dead-code
eliminated different fractions of each segment's shading in each stage
and the seg-1 vs seg-2 split was attribution noise (it claimed seg-2
shading 9.6 ms vs seg-1's ~4 — impossible for static-shape masked XLA,
where per-segment shading cost is data-independent).

Here every stage consumes EVERY leaf of (state, bufs), so stage N's cost
is the true cost of segments 1..N and marginals are honest.  Also: the
phase-1 list stats pad the lane count to a ray_tile multiple the same
way closest_hit_clustered does (the direct _tile_candidates call in
profile_seg2 crashed on 250047 % 512 != 0).

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
ap.add_argument("--segs", type=int, default=4)
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


def consume_all(state, bufs):
    """Sum EVERY leaf so no part of any segment can be DCE'd."""
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(state) + jax.tree.leaves(bufs):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(out))  # warm-up compile + real readback (enqueue != done)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.2f} ms/pulse", flush=True)
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


def make_stage(n_segs, kernel_extra=False):
    @jax.jit
    def stage():
        def f(i):
            s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
            b = mk_bufs()
            for _ in range(n_segs):
                s, b = seg_body(s, b)
            tot = consume_all(s, b)
            if kernel_extra:
                h = hit_only(s)
                tot = tot + jnp.sum(h.t) + jnp.sum(h.tri) + jnp.sum(h.beta) + jnp.sum(h.gamma)
            return tot
        return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))
    return stage


prev = timed("seg1 full (all leaves)", make_stage(1))
k2 = timed("seg1 + seg2 kernel", make_stage(1, kernel_extra=True))
print(f"#   seg2 kernel-only marginal: {(k2 - prev) * 1000:.2f} ms/pulse")
for n in range(2, args.segs + 1):
    cur = timed(f"seg1..seg{n} full", make_stage(n))
    print(f"#   seg{n} full marginal: {(cur - prev) * 1000:.2f} ms/pulse", flush=True)
    prev = cur

# --- phase-1 list statistics, per segment (one pulse, lanes padded) ---
rt = cfg.ray_tile


def p1_stats(tag, origin, direction, tmin):
    lp = -(-origin.shape[0] // rt) * rt
    pad = lp - origin.shape[0]
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate([direction, jnp.zeros((pad, 3), direction.dtype)])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), tmin.dtype)])
    cand, meta, bits, *_ = _tile_candidates(
        origin, direction, tmin, sc0.aabb_mn, sc0.aabb_mx,
        rt, cfg.sub_tiles, cfg.candidates,
        cand_order=cfg.cand_order, p1_fanout=cfg.p1_fanout,
        p1_super_k=cfg.p1_super_k, p1_fanout0=cfg.p1_fanout0,
        p1_super_k0=cfg.p1_super_k0,
    )
    n = np.asarray(meta[:, 0])
    ovf = np.asarray(meta[:, 1])
    bits_np = np.asarray(bits)
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
          f"DMA KB/tile {n.mean() * 16 * args.cluster_size * 4 / 1024:.0f}", flush=True)


s = _init_state(cfg, batch.tx_origin[0], fan0, jnp.float32)
b = mk_bufs()
for seg in range(1, args.segs + 1):
    live = jnp.where(s.active[:, None], s.direction, 0.0)
    print(f"# seg{seg} live lanes: {int(np.asarray(s.active).sum())} of {l}")
    p1_stats(f"seg{seg} phase-1", s.origin, live, s.tmin)
    s, b = seg_body(s, b)
print("SEG2BPROF DONE")
