"""Per-segment shading cost on the TPU: kernel+phase1 alone vs kernel +
_process_miss + _process_hit (the wavefront body minus loop machinery),
at the production 63^3 fan.  The difference is what shading adds per
segment; compare against trace_fan's marginal segment cost
(profile_r3.py) to see loop/masking machinery on top.

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
print(f"# cs={args.cluster_size} cand={args.candidates} G={args.mt_group} "
      f"rt={args.ray_tile} st={args.sub_tiles} n={args.rays}", file=sys.stderr)

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import TraceBuffers, _init_state, _process_hit, _process_miss
from rts_tpu.ops import closest_hit_clustered

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
    # LaneState is a NamedTuple; the i*1e-12 tmin nudge defeats lax.map
    # hoisting (profile_r3.py)
    return state._replace(tmin=state.tmin + i * 1e-12)


def mk_bufs():
    return TraceBuffers(
        path=jnp.full((cfg.ray_total, cfg.depth_total), -1, jnp.int32),
        rcs=jnp.full((cfg.ray_total, cfg.depth_total, 2), -1000000.0, jnp.float32),
    )


@jax.jit
def stage_k1():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        h = hit_only(s)
        return jnp.sum(h.t) + jnp.sum(h.tri)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def stage_k1s():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        s2, b2 = seg_body(s, mk_bufs())
        return jnp.sum(s2.power) + jnp.sum(s2.origin) + jnp.sum(b2.rcs)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


@jax.jit
def stage_k2s():
    def f(i):
        s = perturb(_init_state(cfg, batch.tx_origin[0], fan0, jnp.float32), i)
        s2, b2 = seg_body(s, mk_bufs())
        s3, b3 = seg_body(s2, b2)
        return jnp.sum(s3.power) + jnp.sum(s3.origin) + jnp.sum(b3.rcs)
    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


a = timed("seg1 kernel only", stage_k1)
b = timed("seg1 kernel+shading", stage_k1s)
print(f"#   shading (seg1 hit+miss): {(b - a) * 1000:.2f} ms/pulse")
c = timed("seg1+seg2 kernel+shading", stage_k2s)
print(f"#   seg2 marginal (kernel+shading): {(c - b) * 1000:.2f} ms/pulse")
print("SHADPROF DONE")
