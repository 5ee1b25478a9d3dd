"""Split the unattributed ~3.5 ms/segment of the hit body (after
profile_shading3 attributed gather ~0, scatters ~1.7-2.5, miss ~1.3 of
the ~6.7-7.9 ms/segment extras).

Same DCE-proof harness as profile_shading3 (every stage consumes every
state/buffer leaf; values may change — timing-only attribution):

  - notrig:    _cart_to_sph2 -> linear components (kills 4 atan2 + 1
               sqrt per lane per segment: k0 and k1r angle pairs)
  - nosmooth:  interpolate_smooth=False (geometric pack normal — kills
               the [T,10] shade gather, barycentric interpolation AND
               the per-lane 3x3 rotation; the REAL config toggle)
  - noscatter: _scatter_col -> identity (cross-check vs shading3)
  - notrig+noscatter: additivity check
  - floor:     minimal chain advance (bound on winnable)

Run alone (the axon tunnel serialises TPU processes).
"""
import argparse
import dataclasses
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
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=63)
ap.add_argument("--segs", type=int, default=2)
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=128,
    ray_tile=512, candidates=64, sub_tiles=8,
    mt_group=8, mt_union=True, cand_order="near",
    p1_fanout=8, p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
    fan_order="raster", refine=False, replay_cap=16384,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

import rts_tpu.engine.wavefront as wf
from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import TraceBuffers, _init_state
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)

_orig_trig = wf._cart_to_sph2
_orig_scatter = wf._scatter_col
_orig_hit = wf._process_hit


def hit_only(state):
    live = jnp.where(state.active, state.direction, 0.0)
    return closest_hit_clustered(
        state.origin, live, state.tmin, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx,
        batch.tx_origin[0], cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
        group_size=cfg.group_size, super_size=cfg.super_size,
        sub_tiles=cfg.sub_tiles, candidates=cfg.candidates, mt_group=cfg.mt_group,
        components=True,
    )


def consume_all(state, bufs):
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(state) + jax.tree.leaves(bufs):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def mk_bufs():  # lanes-last buffers
    return TraceBuffers(
        path=jnp.full((cfg.depth_total, cfg.ray_total), -1, jnp.int32),
        rcs=jnp.full((2, cfg.depth_total, cfg.ray_total), -1000000.0, jnp.float32),
    )


def build_stage(n_segs, cfg_used):
    pm = wf._process_miss
    ph = wf._process_hit

    def seg_body(state, bufs):
        hit = hit_only(state)
        hm = state.active & hit.found
        mm = state.active & ~hit.found
        state = pm(state, mm, rxg0, batch.tx_origin[0], cfg_used)
        state, bufs = ph(state, bufs, hit, hm, sc0, batch.tx_origin[0], cfg_used, l)
        return state, bufs

    @jax.jit
    def stage():
        def f(i):
            s = _init_state(cfg_used, batch.tx_origin[0], fan0.T, jnp.float32)
            s = s._replace(tmin=s.tmin + i * 1e-12)
            b = mk_bufs()
            for _ in range(n_segs):
                s, b = seg_body(s, b)
            return consume_all(s, b)
        return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))

    return stage


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(out))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / P * 1000:.2f} ms/pulse", flush=True)
    return best / P


S = args.segs
cfg_flat = dataclasses.replace(cfg, interpolate_smooth=False)

full = timed(f"full {S}-seg body", build_stage(S, cfg))

wf._cart_to_sph2 = lambda v: (v[1], v[2])
nt = timed("  - trig (atan2 pairs)", build_stage(S, cfg))
wf._cart_to_sph2 = _orig_trig

nsm = timed("  - smooth normals (gather+interp+rotate)", build_stage(S, cfg_flat))

wf._scatter_col = lambda buf, col, value, mask: buf
nsc = timed("  - scatters", build_stage(S, cfg))
wf._cart_to_sph2 = lambda v: (v[1], v[2])
nts = timed("  - trig+scatters", build_stage(S, cfg))
wf._cart_to_sph2 = _orig_trig
wf._scatter_col = _orig_scatter


def _min_hit(state, bufs, hit, hit_mask, scene, tx_origin, cfg_, n3, spawn=True):
    gate = hit_mask & ~state.end
    hit_t = jnp.where(gate, hit.t.astype(state.origin.dtype), 0.0)
    origin = jnp.where(gate, state.origin + hit_t[None] * state.direction, state.origin)
    refl_depth = jnp.where(gate, state.refl_depth + 1, state.refl_depth)
    active = (gate & (refl_depth < cfg_.max_refl_dev)) | (~hit_mask & state.active)
    return (
        state._replace(origin=origin, refl_depth=refl_depth, active=active,
                       ray_length=state.ray_length + hit_t),
        bufs,
    )


wf._process_hit = _min_hit
minh = timed("  minimal hit body (floor)", build_stage(S, cfg))
wf._process_hit = _orig_hit

print(f"# deltas per segment (ms/pulse): trig {(full - nt) / S * 1000:.2f}, "
      f"smooth {(full - nsm) / S * 1000:.2f}, scatters {(full - nsc) / S * 1000:.2f}, "
      f"trig+scatters {(full - nts) / S * 1000:.2f}, "
      f"hit-body-above-floor {(full - minh) / S * 1000:.2f}")
print("HITSPLIT DONE")
