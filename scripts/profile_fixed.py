"""Fixed-cost split of one traversal call: phase 1 alone, full kernel on
a LIVE segment-1 input, and full kernel on a DEAD input (all directions
zero -> zero candidates, zero DMAs, zero MT windows).  The dead call is
a direct measurement of (p1 dense passes + per-grid-step Mosaic fixed
cost + dispatch) at the production 489-tile grid — the number needed to
explain profile_seg2b's ~20 ms/pulse marginal for a fully dead segment.

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

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import _init_state
from rts_tpu.ops import closest_hit_clustered
from rts_tpu.ops.cluster_trace import _tile_candidates

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
s0 = _init_state(cfg, batch.tx_origin[0], fan0.T, jnp.float32)  # [3, F] engine layout
l = fan0.shape[0]
rt = cfg.ray_tile
lp = -(-l // rt) * rt


def pad(a):  # lanes-last pad (components engine layout end-to-end)
    p = lp - a.shape[-1]
    return jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (p,), a.dtype)], axis=-1) if p else a


o_live, d_live, tm_live = pad(s0.origin), pad(s0.direction), pad(s0.tmin)
d_dead = jnp.zeros_like(d_live)


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(out))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / P * 1000:.2f} ms/pulse-equivalent", flush=True)
    return best / P


def p1_only(d_in):
    @jax.jit
    def f():
        def g(i):
            cand, meta, bits, *_ = _tile_candidates(
                o_live, d_in, tm_live + i * 1e-12, sc0.aabb_mn, sc0.aabb_mx,
                rt, cfg.sub_tiles, cfg.candidates, cand_order=cfg.cand_order,
                p1_fanout=cfg.p1_fanout, p1_super_k=cfg.p1_super_k,
                p1_fanout0=cfg.p1_fanout0, p1_super_k0=cfg.p1_super_k0,
            )
            return jnp.sum(cand) + jnp.sum(meta) + jnp.sum(bits)
        return jax.lax.map(g, jnp.arange(P, dtype=jnp.float32))
    return f


def kernel_full(d_in):
    @jax.jit
    def f():
        def g(i):
            h = closest_hit_clustered(
                o_live, d_in, tm_live + i * 1e-12, sc0.tri_pack,
                sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0],
                cluster_size=cfg.cluster_size, ray_tile=rt,
                group_size=cfg.group_size, super_size=cfg.super_size,
                sub_tiles=cfg.sub_tiles, candidates=cfg.candidates,
                mt_group=cfg.mt_group, components=True,
            )
            return jnp.sum(h.t) + jnp.sum(h.tri) + jnp.sum(h.beta) + jnp.sum(h.gamma)
        return jax.lax.map(g, jnp.arange(P, dtype=jnp.float32))
    return f


a = timed("phase-1 alone, LIVE seg-1 input", p1_only(d_live))
b = timed("phase-1 alone, DEAD input", p1_only(d_dead))
c = timed("p1+kernel, LIVE seg-1 input", kernel_full(d_live))
d = timed("p1+kernel, DEAD input", kernel_full(d_dead))
print(f"# kernel-only LIVE {(c - a) * 1000:.2f} ms; kernel-only DEAD "
      f"{(d - b) * 1000:.2f} ms over {lp // rt} grid steps "
      f"= {(d - b) * 1e6 / (lp // rt):.2f} us/tile fixed")
print("FIXEDPROF DONE")
