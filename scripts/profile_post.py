"""In-situ marginal cost of the per-pulse stages OUTSIDE trace_fan at
the PRODUCTION config (refine ON, replay_cap=256, narrow auto): the
per-pulse budget arithmetic leaves ~10+ ms/pulse to replay_refine +
postprocess + aggregate + animate/fan, none of which any profiler has
measured in situ.

Stages are cumulative, each consumes every output leaf (DCE-proof), all
under the same lax.map-over-pulses harness as engine.cpi.map_pulses.
Marginals attribute the cost; the P=8 dispatch floor (~3 ms/pulse)
cancels in the differences.

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
    fan_order="raster", refine=True, replay_cap=256, compact_narrow=-1,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.replay import replay_refine
from rts_tpu.engine.wavefront import trace_fan
from rts_tpu.physics.postprocess import postprocess
from rts_tpu.aggregate import aggregate_lanes

kw = spec.kwargs()


def consume(*trees):
    tot = jnp.float32(0)
    for tr in trees:
        for leaf in jax.tree.leaves(tr):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def mk_stage(upto):
    """0 trace, 1 +replay, 2 +postprocess, 3 +aggregate (== one_pulse)."""

    def pulse(xs):
        rot, pos, vel, rxg, rxp, txo, txd, t, refine = xs
        scene = animate_packed(base, rot, pos, vel, cfg.cluster_size)
        fan = generate_fan(cfg.num_rays, (txd[0], txd[1]), kw["tx_span"], dtype=base.tri_verts.dtype)
        res = trace_fan(scene, rxg, txo, fan, cfg)
        if upto == 0:
            return consume(res)
        res = replay_refine(
            base, res, cfg, refine, rot=rot, pos=pos, vel=vel, rx_geom=rxg,
            tx_origin=txo, tx_span=kw["tx_span"],
            fan_block=cfg.rays_per_fan, fan_offset=jnp.int32(0),
        )
        if upto == 1:
            return consume(res)
        power, doppler, delay = postprocess(
            res, tx_origin=txo, rx_positions=rxp, rcs_models=kw["rcs_models"],
            tx_gain=kw["tx_gain"], rx_gains=kw["rx_gains"],
            tx_rotation=(txd[0], txd[1]), rx_rotation_fns=kw["rx_rotation_fns"],
            time_t=t, carrier=kw["carrier"], cspeed=kw["cspeed"],
        )
        if upto == 2:
            return consume(res, power, doppler, delay)
        agg = aggregate_lanes(
            res.received, res.refl_depth, res.refr_depth, res.path, power,
            res.ray_length, doppler, num_rx=kw["num_rx"], cspeed=kw["cspeed"],
            carrier=kw["carrier"],
            ray_length_lo=res.ray_length_lo if cfg.refine else None,
            num_targets=int(base.target_refl.shape[0]),
        )
        return consume(res, power, doppler, delay, agg)

    arg_tuple = (
        batch.rot, batch.pos, batch.vel, batch.rx_geom, batch.rx_pos,
        batch.tx_origin, batch.tx_dir, batch.times, batch.refine,
    )

    @jax.jit
    def stage():
        return jax.lax.map(pulse, arg_tuple)

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


names = ["trace_fan only", "+ replay_refine", "+ postprocess", "+ aggregate (full pulse)"]
vals = []
for i, nm in enumerate(names):
    vals.append(timed(nm, mk_stage(i)))
    if i:
        print(f"#   marginal: {(vals[i] - vals[i - 1]) * 1000:.2f} ms/pulse", flush=True)
print("POSTPROF DONE")
