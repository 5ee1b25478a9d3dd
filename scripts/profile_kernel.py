"""Disambiguate kernel-vs-shading cost: time the traversal kernel with
genuinely per-iteration-varying inputs (no loop-invariant hoisting)."""
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
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=31, pulses=8, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=args.cluster_size,
    ray_tile=args.ray_tile, candidates=args.candidates, sub_tiles=8, fan_order=args.fan_order, refine=False,
    replay_cap=16384, tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec, n_tris = B.build(bargs)
P = 8

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.ops import closest_hit_clustered
from rts_tpu.ops.cluster_trace import _tile_candidates

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
tmin0 = jnp.full((l,), 0.005, jnp.float32)
orig0 = jnp.broadcast_to(batch.tx_origin[0], fan0.shape)
# 8 genuinely different fans: tiny per-pulse direction perturbations
eps = (jnp.arange(P, dtype=jnp.float32) * 1e-7)[:, None, None]
fans = fan0[None] * (1.0 + eps)
origs = jnp.broadcast_to(orig0[None], (P, l, 3))
tmins = jnp.broadcast_to(tmin0[None], (P, l))

l_pad = -(-l // cfg.ray_tile) * cfg.ray_tile
pad = l_pad - l
fansp = jnp.concatenate([fans, jnp.zeros((P, pad, 3), jnp.float32)], axis=1)
origsp = jnp.concatenate([origs, jnp.zeros((P, pad, 3), jnp.float32)], axis=1)
tminsp = jnp.concatenate([tmins, jnp.zeros((P, pad), jnp.float32)], axis=1)


def timed(name, fn, *a, n=3):
    out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms total, {(best)/P*1000:.2f} ms/iter")
    return best


floor = timed("floor", jax.jit(lambda x: jax.lax.map(lambda y: y * 2.0, x)), batch.times)


@jax.jit
def k8(fs, os_, ts, pack, mn, mx, txo):
    def f(x):
        o, d, t = x
        h = closest_hit_clustered(
            o, d, t, pack, mn, mx, txo,
            cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
            group_size=cfg.group_size, super_size=cfg.super_size,
            sub_tiles=cfg.sub_tiles, candidates=cfg.candidates,
        )
        return jnp.sum(h.t) + jnp.sum(h.tri)
    return jax.lax.map(f, (os_, fs, ts))

timed("kernel x8 varied", k8, origs, fans, tmins, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0])


@jax.jit
def p8(fs, os_, ts, mn, mx):
    def f(x):
        o, d, t = x
        c, m, _b, *_ = _tile_candidates(o, d, t, mn, mx, cfg.ray_tile, cfg.sub_tiles, cfg.candidates)
        return jnp.sum(c) + jnp.sum(m)
    return jax.lax.map(f, (os_, fs, ts))

timed("phase1 x8 varied", p8, origsp, fansp, tminsp, sc0.aabb_mn, sc0.aabb_mx)
