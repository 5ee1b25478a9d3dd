"""Bisect the ~6 us/tile dead-input kernel floor (docs/PERF.md r3m:
~12 ns/ray, scales with rows not grid steps) by DELETING kernel stages
via cluster_trace._KERNEL_FLOOR bits and timing the kernel on a dead
input (all directions zero -> zero candidates, zero DMAs, zero MT
windows).  Output values are garbage under nonzero masks — timing only.

  bit 0 (1): hoisted per-tile component math -> vreg constants
  bit 1 (2): skip t/i/b/g output init fills
  bit 2 (4): skip the stats_out tail write
  bit 3 (8): skip the candidate/sweep dispatch (loops + drain)

Also times the LIVE seg-1 input at mask 0 and mask 1|2|4 (live deltas
say whether a stage matters when real work hides it).

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

import rts_tpu.ops.cluster_trace as ct
from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import _init_state
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
s0 = _init_state(cfg, batch.tx_origin[0], fan0, jnp.float32)
l = fan0.shape[0]
rt = cfg.ray_tile
lp = -(-l // rt) * rt


def pad(a):
    p = lp - a.shape[0]
    return jnp.concatenate([a, jnp.zeros((p,) + a.shape[1:], a.dtype)]) if p else a


o_in, d_live, tm_in = pad(s0.origin), pad(s0.direction), pad(s0.tmin)
d_dead = jnp.zeros_like(d_live)
tiles = lp // rt


def kernel(d_in):
    @jax.jit
    def f():
        def g(i):
            h = closest_hit_clustered(
                o_in, d_in, tm_in + i * 1e-12, sc0.tri_pack,
                sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0],
                cluster_size=cfg.cluster_size, ray_tile=rt,
                group_size=cfg.group_size, super_size=cfg.super_size,
                sub_tiles=cfg.sub_tiles, candidates=cfg.candidates,
                mt_group=cfg.mt_group,
            )
            # nan-safe consumption (garbage outputs under floor masks)
            tot = jnp.float32(0)
            for a in (h.t, h.beta, h.gamma):
                tot = tot + jnp.sum(jnp.where(jnp.isfinite(a), a, 0.0))
            return tot + jnp.sum(h.tri).astype(jnp.float32)
        return jax.lax.map(g, jnp.arange(P, dtype=jnp.float32))
    return f


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(out))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    us_tile = best / P * 1e6 / tiles
    print(f"{name}: {best / P * 1000:.2f} ms/pulse = {us_tile:.2f} us/tile",
          flush=True)
    return best / P


rows = {}
for mask in (0, 1, 2, 4, 8, 3, 7, 15):
    ct._KERNEL_FLOOR = mask
    rows[mask] = timed(f"DEAD mask={mask:2d}", kernel(d_dead))

ct._KERNEL_FLOOR = 0
live0 = timed("LIVE mask= 0", kernel(d_live))
ct._KERNEL_FLOOR = 7
live7 = timed("LIVE mask= 7 (math+init+stats off)", kernel(d_live))
ct._KERNEL_FLOOR = 0

print(f"# deltas vs mask0 (us/tile): math {((rows[0] - rows[1]) * 1e6 / tiles):.2f}, "
      f"init {((rows[0] - rows[2]) * 1e6 / tiles):.2f}, "
      f"stats {((rows[0] - rows[4]) * 1e6 / tiles):.2f}, "
      f"dispatch {((rows[0] - rows[8]) * 1e6 / tiles):.2f}, "
      f"all-but-dispatch {((rows[0] - rows[7]) * 1e6 / tiles):.2f}, "
      f"everything {((rows[0] - rows[15]) * 1e6 / tiles):.2f}")
print(f"# LIVE delta for math+init+stats: {(live0 - live7) * 1000:.2f} ms/pulse")
print("KFLOOR DONE")
