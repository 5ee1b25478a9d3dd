"""Per-stage TPU timing decomposition of the 1M-tri bench pulse.

Each stage is timed as a lax.map over the 8-pulse batch inside ONE jit
call (amortises the ~25 ms tunnel dispatch floor), synchronised by scalar
readback.  Run alone (the axon tunnel serialises processes).
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
ap.add_argument("--cluster-size", type=int, default=1024)
ap.add_argument("--candidates", type=int, default=64)
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--fan-order", default="raster")
ap.add_argument("--pulses", type=int, default=8)
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=31, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=args.cluster_size,
    ray_tile=args.ray_tile, candidates=args.candidates, sub_tiles=8, fan_order=args.fan_order, refine=False,
    replay_cap=16384, tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec, n_tris = B.build(bargs)
P = args.pulses
print(f"# {n_tris} tris, cs={args.cluster_size} cand={args.candidates} rt={args.ray_tile}", file=sys.stderr)

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.cpi import make_pulse_fn, trace_cpi
from rts_tpu.engine.fan import generate_fan
from rts_tpu.ops import closest_hit_clustered
from rts_tpu.ops.cluster_trace import _tile_candidates

one_pulse, aggregate = make_pulse_fn(base, cfg, **spec.kwargs())


def timed(name, fn, *a, n=3):
    out = fn(*a)
    s = jax.tree.leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)))  # warm + sync
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        s = jax.tree.leaves(out)[0]
        float(jnp.sum(s.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms total, {best/P*1000:.2f} ms/pulse")
    return best


# 0. dispatch floor
floor = timed("floor (8x trivial)", jax.jit(lambda x: jax.lax.map(lambda y: y * 2.0, x)), batch.times)

# 1. scene animation (pack transform + corner refit)
@jax.jit
def stage_animate(b):
    def f(x):
        sc = animate_packed(base, x[0], x[1], x[2], cfg.cluster_size)
        return jnp.sum(sc.tri_pack) + jnp.sum(jnp.where(jnp.isfinite(sc.aabb_mn), sc.aabb_mn, 0.0))
    return jax.lax.map(f, (b.rot, b.pos, b.vel))

timed("animate (pack+refit)", stage_animate, batch)

# 2. phase-1 candidates on the primary fan
sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
tmin0 = jnp.full((l,), 0.005, jnp.float32)
orig0 = jnp.broadcast_to(batch.tx_origin[0], fan0.shape)
# _tile_candidates expects tile-padded rays (closest_hit_clustered pads internally)
l_pad = -(-l // cfg.ray_tile) * cfg.ray_tile
fan0p = jnp.concatenate([fan0, jnp.zeros((l_pad - l, 3), fan0.dtype)])
orig0p = jnp.concatenate([orig0, jnp.zeros((l_pad - l, 3), orig0.dtype)])
tmin0p = jnp.concatenate([tmin0, jnp.zeros((l_pad - l,), tmin0.dtype)])

if args.candidates:
    @jax.jit
    def stage_phase1(o, d, t, mn, mx):
        def f(_):
            c, m, _b, *_ = _tile_candidates(o, d, t, mn, mx, cfg.ray_tile, cfg.sub_tiles, cfg.candidates)
            return jnp.sum(c) + jnp.sum(m)
        return jax.lax.map(f, jnp.arange(P))

    timed("phase1 candidates x8", stage_phase1, orig0p, fan0p, tmin0p, sc0.aabb_mn, sc0.aabb_mx)

# 3. one traversal segment (kernel incl. phase 1), primary fan, x8
@jax.jit
def stage_kernel(o, d, t, pack, mn, mx, txo):
    def f(_):
        h = closest_hit_clustered(
            o, d, t, pack, mn, mx, txo,
            cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
            group_size=cfg.group_size, super_size=cfg.super_size,
            sub_tiles=cfg.sub_tiles, candidates=cfg.candidates,
        )
        return jnp.sum(h.t) + jnp.sum(h.tri)
    return jax.lax.map(f, jnp.arange(P))

timed("segment-1 kernel x8", stage_kernel, orig0, fan0, tmin0, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0])

# 3b. trace_fan at 4 vs 2 segments -> per-segment shading cost by slope
import dataclasses

from rts_tpu.engine.animate import animate_packed as _ap
from rts_tpu.engine.wavefront import trace_fan

rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)


def mk_tracefan(c):
    @jax.jit
    def stage(b):
        def f(x):
            rot, pos, vel, txo, txd = x
            sc = _ap(base, rot, pos, vel, c.cluster_size)
            fan = generate_fan(c.num_rays, (txd[0], txd[1]), spec.kwargs()["tx_span"], dtype=jnp.float32)
            res = trace_fan(sc, rxg0, txo, fan, c)
            return jnp.sum(res.ray_length) + jnp.sum(res.power)
        return jax.lax.map(f, (b.rot, b.pos, b.vel, b.tx_origin, b.tx_dir))
    return stage

timed("tracefan 4seg", mk_tracefan(cfg), batch)
cfg2 = dataclasses.replace(cfg, max_refl_dev=1)
timed("tracefan 2seg", mk_tracefan(cfg2), batch)

# 4. full trace (animate + 4 segments + hit/miss shading), no postprocess
@jax.jit
def stage_trace(b):
    def f(x):
        res, power, doppler, delay = one_pulse(*x)
        return jnp.sum(power) + jnp.sum(res.ray_length)
    return jax.lax.map(f, (b.rot, b.pos, b.vel, b.rx_geom, b.rx_pos, b.tx_origin, b.tx_dir, b.times))

timed("trace+postprocess", stage_trace, batch)

# 5. everything incl. aggregation (= the bench measurement)
@jax.jit
def stage_full(b):
    def f(x):
        out = aggregate(*one_pulse(*x))
        return out
    return jax.lax.map(f, (b.rot, b.pos, b.vel, b.rx_geom, b.rx_pos, b.tx_origin, b.tx_dir, b.times))

timed("full (trace+post+agg)", stage_full, batch)
