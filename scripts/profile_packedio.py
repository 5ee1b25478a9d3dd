"""Measure the packed-I/O kernel (RTS_KERNEL_PACKED_IO) on hardware.

The r3q dead-floor bisect proved the ~6 us/tile kernel row floor is the
pipeline DMA of the lane-padded legacy I/O blocks (deleting the whole
kernel body moved nothing — scripts/profile_kfloor.py).  Packed mode
feeds one [8, lp] ray pack and writes one [8, lp] output (2 block
copies / ~32 KB per tile instead of 7 / ~1.8 MB).  This times the live
seg-1 kernel and the dead-input floor under the CURRENT module default
(set RTS_KERNEL_PACKED_IO=0/1 in the environment to A/B).

Reference (unpacked, r3q, P=8, incl. ~6.4 us/tile dispatch):
  DEAD 14.6-14.9 us/tile, LIVE 31.9 us/tile.

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

print(f"# _PACKED_IO = {ct._PACKED_IO}", flush=True)

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
from rts_tpu.engine.fan import generate_fan_c

s0 = _init_state(cfg, batch.tx_origin[0],
                 generate_fan_c(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]),
                                spec.kwargs()["tx_span"]), jnp.float32)
l = fan0.shape[0]
rt = cfg.ray_tile
lp = -(-l // rt) * rt
tiles = lp // rt


def pad(a):
    p = lp - a.shape[0]
    return jnp.concatenate([a, jnp.zeros((p,) + a.shape[1:], a.dtype)]) if p else a


# engine state is components-major [3, L]; the kernel entry takes row
# layout by default, so transpose here (the engine path passes
# components=True and skips this)
o_in, d_live, tm_in = pad(s0.origin.T), pad(s0.direction.T), pad(s0.tmin)
d_dead = jnp.zeros_like(d_live)


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
    print(f"{name}: {best / P * 1000:.2f} ms/pulse = {best / P * 1e6 / tiles:.2f} us/tile",
          flush=True)
    return best / P


live = timed("LIVE seg-1", kernel(d_live))
dead = timed("DEAD input", kernel(d_dead))
print("PACKEDIO DONE", flush=True)
