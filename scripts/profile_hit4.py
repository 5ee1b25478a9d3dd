"""Finer in-situ hit/miss body decomposition (r5).

Extends profile_shading3's DCE-proof monkey-patch harness with the
round-5 stages:

  - rcs_angles False vs True: the aspect-free elision (6 atan2 chains +
    two [2,D,R] one-hot scatters per segment statically removed)
  - noatan:  wf._atan2 -> mul/add stand-in (with rcs_angles=False this
    isolates the MISS-path window trig: 4 atan2 per rx per segment)
  - nospawn: _process_hit(spawn=False) — times the refraction spawn
    machinery (whole-tree lane shift + child/parent merge + prefill)
  - noscatter / nomiss / minimal floor: as in profile_shading3

Values change under the stubs (timing only).  Run alone (the axon
tunnel serialises TPU processes).
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
base, batch, cfg0, spec = B.build(bargs)[:4]
P = args.pulses

import rts_tpu.engine.wavefront as wf
from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import TraceBuffers, _init_state
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg0.cluster_size)
fan0 = generate_fan(cfg0.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)

_orig_atan2 = wf._atan2
_orig_scatter = wf._scatter_col
_orig_miss = wf._process_miss
_orig_hit = wf._process_hit

CFG_ON = dataclasses.replace(cfg0, rcs_angles=True)
CFG_OFF = dataclasses.replace(cfg0, rcs_angles=False)


def consume_all(state, bufs):
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(state) + jax.tree.leaves(bufs):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def mk_bufs(cfg):
    return TraceBuffers(
        path=jnp.full((cfg.depth_total, cfg.ray_total), -1, jnp.int32),
        rcs=jnp.full((2, cfg.depth_total, cfg.ray_total), -1000000.0, jnp.float32),
    )


def build_stage(n_segs, cfg, spawn=True):
    pm = wf._process_miss
    ph = wf._process_hit

    def seg_body(state, bufs):
        live = jnp.where(state.active, state.direction, 0.0)
        hit = closest_hit_clustered(
            state.origin, live, state.tmin, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx,
            batch.tx_origin[0], cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
            group_size=cfg.group_size, super_size=cfg.super_size,
            sub_tiles=cfg.sub_tiles, candidates=cfg.candidates, mt_group=cfg.mt_group,
            components=True,
        )
        hm = state.active & hit.found
        mm = state.active & ~hit.found
        state = pm(state, mm, rxg0, batch.tx_origin[0], cfg)
        state, bufs = ph(state, bufs, hit, hm, sc0, batch.tx_origin[0], cfg, l, spawn=spawn)
        return state, bufs

    @jax.jit
    def stage():
        def f(i):
            s = _init_state(cfg, batch.tx_origin[0], fan0.T, jnp.float32)
            s = s._replace(tmin=s.tmin + i * 1e-12)
            b = mk_bufs(cfg)
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


S = args.segs
full_on = timed(f"full {S}-seg, rcs_angles=ON ", build_stage(S, CFG_ON))
full_off = timed(f"full {S}-seg, rcs_angles=OFF", build_stage(S, CFG_OFF))

# NOTE: after the r3 sector-form rewrite the relaxed miss path calls no
# _atan2 at all, and with rcs_angles=False the hit-path calls are elided
# too — this stage only measures anything under strict_parity or with
# rcs_angles=True; at the production config expect ~0.
wf._atan2 = lambda y, x: y * 0.5 + x * 0.25
noatan = timed("  OFF - miss atan2 (expect ~0: sector form)", build_stage(S, CFG_OFF))
wf._atan2 = _orig_atan2

nospawn = timed("  OFF - spawn machinery", build_stage(S, CFG_OFF, spawn=False))

wf._scatter_col = lambda buf, col, val, mask: buf
nosc = timed("  OFF - path/tri_seq scatters", build_stage(S, CFG_OFF))
wf._scatter_col = _orig_scatter

wf._process_miss = lambda state, mm, rx, tx, cfg_: state
nomiss = timed("  OFF - process_miss", build_stage(S, CFG_OFF))
wf._process_miss = _orig_miss

wf._process_hit = _min_hit
minh = timed("  OFF minimal hit body (floor)", build_stage(S, CFG_OFF))
wf._process_hit = _orig_hit

print(f"# deltas per segment (ms/pulse): rcs_angles {(full_on - full_off) / S * 1000:.2f}, "
      f"miss-atan2 {(full_off - noatan) / S * 1000:.2f}, "
      f"spawn {(full_off - nospawn) / S * 1000:.2f}, "
      f"scatters {(full_off - nosc) / S * 1000:.2f}, "
      f"miss {(full_off - nomiss) / S * 1000:.2f}, "
      f"hit-above-floor {(full_off - minh) / S * 1000:.2f}")
print("HIT4 DONE")
