"""Variants of phase-1's FINAL selection stage (bits + top_k + gather +
padding), which profile_phase1 measured at 1.68 ms/pulse-segment — wildly
heavy for its tiny [tiles, kf] shapes.  Hypotheses:

  (a) the f32 top_k (a variadic sort) lowers slowly -> v1 replaces the
      key with an order-identical int32 bitcast (non-negative f32 bit
      patterns sort like values; ties keep index order in both), and
  (b) the top_k/sort fusion boundary DUPLICATES the [tiles, rt, kf] l2
      slab chain into several consumer fusions -> v2 pins the [tiles,
      st, kf] partials with lax.optimization_barrier.

v1 (and v3's selection) must be BIT-IDENTICAL to v0; asserted on device.

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
    fan_order="raster", refine=False, replay_cap=16384,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.ops import cluster_trace as CT

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
l_pad = -(-l // cfg.ray_tile) * cfg.ray_tile


def padded(a, fill=0.0):
    pad = l_pad - a.shape[0]
    return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])


o_in = padded(jnp.broadcast_to(batch.tx_origin[0], fan0.shape))
d_in = padded(fan0)
tm_in = padded(jnp.full((l,), 0.005, jnp.float32))
mn_in, mx_in = sc0.aabb_mn, sc0.aabb_mx
rt, st, k_max = cfg.ray_tile, cfg.sub_tiles, cfg.candidates


def timed(name, fn, n=3):
    out = fn()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(out)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(out)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / P * 1000:.2f} ms/pulse-equivalent", flush=True)
    return best / P


def mk(mode):
    @jax.jit
    def f():
        def g(i):
            cand, meta, bits, *_ = CT._tile_candidates(
                o_in, d_in, tm_in + i * 1e-12, mn_in, mx_in, rt, st, k_max,
                cand_order=cfg.cand_order, p1_fanout=cfg.p1_fanout,
                p1_super_k=cfg.p1_super_k, p1_fanout0=cfg.p1_fanout0,
                p1_super_k0=cfg.p1_super_k0,
            )
            return jnp.sum(cand) + jnp.sum(meta) + jnp.sum(bits)
        return jax.lax.map(g, jnp.arange(P, dtype=jnp.float32))
    return f


# The selection seam is module-level-patchable: CT._p1_select (added for
# this experiment).  Each mode swaps the implementation.
for mode, name in [(0, "v0 current"), (1, "v1 int-key top_k"),
                   (2, "v2 barrier partials"), (3, "v3 int-key+barrier")]:
    CT._P1_SEL_MODE = mode
    timed(name, mk(mode))
CT._P1_SEL_MODE = 0

# bit-identity of v1 vs v0 on one pulse
CT._P1_SEL_MODE = 0
a = jax.jit(lambda: CT._tile_candidates(o_in, d_in, tm_in, mn_in, mx_in, rt, st, k_max,
                                        cand_order=cfg.cand_order, p1_fanout=cfg.p1_fanout,
                                        p1_super_k=cfg.p1_super_k, p1_fanout0=cfg.p1_fanout0,
                                        p1_super_k0=cfg.p1_super_k0))()
CT._P1_SEL_MODE = 1
b = jax.jit(lambda: CT._tile_candidates(o_in, d_in, tm_in, mn_in, mx_in, rt, st, k_max,
                                        cand_order=cfg.cand_order, p1_fanout=cfg.p1_fanout,
                                        p1_super_k=cfg.p1_super_k, p1_fanout0=cfg.p1_fanout0,
                                        p1_super_k0=cfg.p1_super_k0))()
CT._P1_SEL_MODE = 0
for x, y, nm in zip(a, b, ("cand", "meta", "bits")):
    same = bool(jnp.all(x == y))
    print(f"# v1 bit-identity {nm}: {same}")
    assert same, nm
print("P1SEL DONE")
