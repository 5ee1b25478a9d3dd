"""Decompose the ~1 ms/segment shading cost: time _process_hit and
_process_miss alone on REAL segment-1 inputs (hoisting-proof)."""
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
args = ap.parse_args()
bargs = argparse.Namespace(
    tris=1000000, rays=31, pulses=args.pulses, repeat=1, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=256, ray_tile=512,
    candidates=64, sub_tiles=8, mt_group=4, fan_order="raster", refine=False,
    replay_cap=256, tiny=False, cpi256=False, stats=False)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import TraceBuffers, _init_state, _process_hit, _process_miss
from rts_tpu.ops import closest_hit_clustered

sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)
txo = batch.tx_origin[0]

state0 = _init_state(cfg, txo, fan0, jnp.float32)
hit0 = closest_hit_clustered(
    state0.origin, state0.direction, state0.tmin, sc0.tri_pack, sc0.aabb_mn,
    sc0.aabb_mx, txo, cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
    group_size=cfg.group_size, super_size=cfg.super_size, sub_tiles=cfg.sub_tiles,
    candidates=cfg.candidates, mt_group=cfg.mt_group)
hit0 = jax.tree.map(jax.block_until_ready, hit0)
bufs0 = TraceBuffers(
    path=jnp.full((cfg.ray_total, cfg.depth_total), -1, jnp.int32),
    rcs=jnp.full((cfg.ray_total, cfg.depth_total, 2), -1000000.0, jnp.float32))


def timed(name, fn, *a, n=3):
    out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms total, {best/P*1000:.2f} ms/pulse")


timed("floor", jax.jit(lambda x: jax.lax.map(lambda y: y * 2.0, x)), batch.times)


@jax.jit
def stage_hit(st, hit, bufs):
    def f(i):
        st2 = st._replace(tmin=st.tmin + i * 1e-12)
        hm = st2.active & hit.found
        s2, b2 = _process_hit(st2, bufs, hit, hm, sc0, txo, cfg, l)
        # consume EVERY leaf — a partial sum lets XLA dead-code-eliminate
        # most of the stage and time ~nothing
        tot = jnp.float32(0)
        for leaf in jax.tree.leaves((s2, b2)):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


timed("_process_hit x1seg", stage_hit, state0, hit0, bufs0)


@jax.jit
def stage_miss(st, hit):
    def f(i):
        st2 = st._replace(tmin=st.tmin + i * 1e-12)
        mm = st2.active & ~hit.found
        s2 = _process_miss(st2, mm, rxg0, txo, cfg)
        tot = jnp.float32(0)
        for leaf in jax.tree.leaves(s2):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


timed("_process_miss x1seg", stage_miss, state0, hit0)
