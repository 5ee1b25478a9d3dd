"""In-situ shading decomposition with DCE-proof stages.

profile_seg2b gives honest per-segment totals; this splits the
non-kernel part by REMOVING one shading ingredient at a time (monkey-
patched to cheap stand-ins) while every stage still consumes every
state/buffer leaf.  Stage deltas vs the full body attribute the cost:

  - nogather:  gather_shade -> zeros (kills the [T,10] row gather)
  - noscatter: _scatter_col -> identity (kills the path/rcs one-hot
               column scatters and their [R,D(,2)] buffer round-trips)
  - nomiss:    _process_miss -> identity (kills rx capture math)

Values change (that's fine — timing only); the kernel and the rest of
the body stay, so deltas are the in-situ fused cost of each ingredient.

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

_orig_gather = wf._shade_rows
_orig_scatter = wf._scatter_col
_orig_miss = wf._process_miss
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


def build_stage(n_segs):
    # bind the CURRENT (possibly patched) functions
    pm = wf._process_miss
    ph = wf._process_hit

    def seg_body(state, bufs):
        hit = hit_only(state)
        hm = state.active & hit.found
        mm = state.active & ~hit.found
        state = pm(state, mm, rxg0, batch.tx_origin[0], cfg)
        state, bufs = ph(state, bufs, hit, hm, sc0, batch.tx_origin[0], cfg, l)
        return state, bufs

    @jax.jit
    def stage():
        def f(i):
            s = _init_state(cfg, batch.tx_origin[0], fan0.T, jnp.float32)  # [3, F]
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


def with_patches(gather=True, scatter=True, miss=True):
    wf._shade_rows = _orig_gather if gather else (
        lambda table, tri: jnp.zeros((table.shape[1], tri.shape[0]), table.dtype)
    )
    wf._scatter_col = _orig_scatter if scatter else (
        lambda buf, col, val, mask: buf
    )
    wf._process_miss = _orig_miss if miss else (
        lambda state, mm, rx, tx, cfg_: state
    )


def _min_hit(state, bufs, hit, hit_mask, scene, tx_origin, cfg_, n3, spawn=True):
    """Floor stage: only the geometric chain advance (origin/active/
    depth) — bounds what thinning the full hit body could ever win."""
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
with_patches()
full = timed(f"full {S}-seg body", build_stage(S))
wf._process_hit = _min_hit
minh = timed("  minimal hit body (floor)", build_stage(S))
wf._process_hit = _orig_hit
with_patches(gather=False)
ng = timed("  - shade gather", build_stage(S))
with_patches()
with_patches(scatter=False)
ns = timed("  - path/rcs scatters", build_stage(S))
with_patches()
with_patches(miss=False)
nm = timed("  - process_miss", build_stage(S))
with_patches()
with_patches(gather=False, scatter=False, miss=False)
none = timed("  - all three", build_stage(S))
with_patches()

print(f"# deltas per segment (ms/pulse): gather {(full - ng) / S * 1000:.2f}, "
      f"scatters {(full - ns) / S * 1000:.2f}, miss {(full - nm) / S * 1000:.2f}, "
      f"all {(full - none) / S * 1000:.2f}, "
      f"hit-body-above-floor {(full - minh) / S * 1000:.2f}")
print("SHAD3 DONE")
