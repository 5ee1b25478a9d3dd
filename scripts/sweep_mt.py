"""Re-sweep the MT window shape AFTER packed kernel I/O.

The r3h-r3m G/st sweeps ran when the per-tile fixed cost was ~6 us/tile
of pipeline DMA; packed I/O cut that to ~2 us/tile (profile_fixed r3s),
so the balance between window padding waste (HW pairs/ray: G=2 1180,
G=4 1315, G=8 1520 — docs/PERF.md hardware-column table) and per-window
scalar events may have flipped toward narrower windows.  Kernel+p1
harness at P=8 (relative comparison; the row-layout adapter bias is
identical across variants).

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
from rts_tpu.engine.fan import generate_fan_c
from rts_tpu.engine.wavefront import _init_state
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan_c = generate_fan_c(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]),
                       spec.kwargs()["tx_span"])
s0 = _init_state(cfg, batch.tx_origin[0], fan_c, jnp.float32)
l = fan_c.shape[1]
rt = cfg.ray_tile
lp = -(-l // rt) * rt
tiles = lp // rt


def pad_c(a):  # lanes-last pad
    p = lp - a.shape[-1]
    return jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (p,), a.dtype)], axis=-1) if p else a


o_in, d_in, tm_in = pad_c(s0.origin), pad_c(s0.direction), pad_c(s0.tmin)


def kernel(g, st, tail):
    @jax.jit
    def f():
        def body(i):
            h = closest_hit_clustered(
                o_in, d_in, tm_in + i * 1e-12, sc0.tri_pack,
                sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0],
                cluster_size=cfg.cluster_size, ray_tile=rt,
                group_size=cfg.group_size, super_size=cfg.super_size,
                sub_tiles=st, candidates=cfg.candidates,
                mt_group=g, mt_tail=tail, components=True,
            )
            return jnp.sum(h.t) + jnp.sum(h.tri) + jnp.sum(h.beta) + jnp.sum(h.gamma)
        return jax.lax.map(body, jnp.arange(P, dtype=jnp.float32))
    return f


def timed(name, fn, n=3):
    out = fn()
    ref = float(jnp.sum(out))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / P * 1000:.2f} ms/pulse  (checksum {ref:.6e})",
          flush=True)
    return best / P


for g, st, tail in ((8, 8, False), (4, 8, False), (2, 8, False),
                    (8, 8, True), (4, 16, False)):
    timed(f"G={g} st={st} tail={int(tail)}", kernel(g, st, tail))
print("MTSWEEP DONE", flush=True)
