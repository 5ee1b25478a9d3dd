"""Post-trace decomposition at the production config (lanes-last era):
trace_fan only vs +postprocess vs +aggregation vs full one_pulse
(replay on/off), all under a lax.map over P pulses with hoisting-proof
perturbation.  Pins down the non-segment blocks of the 63^3 pulse
budget (docs/PERF.md r4a: ~6 ms between the measured segment costs and
the bench total was unattributed).

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
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--sub-tiles", type=int, default=8)
args = ap.parse_args()

# production defaults (bench.py main defaults, refine toggled per stage)
bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=128,
    ray_tile=args.ray_tile, candidates=64, sub_tiles=args.sub_tiles,
    mt_group=8, mt_union=True, cand_order="near",
    p1_fanout=8, p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
    compact_narrow=-1, fan_order="raster", refine=True, replay_cap=256,
    agg_cap=4096, tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses
import dataclasses

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.cpi import make_pulse_fn
from rts_tpu.engine.fan import generate_fan_c
from rts_tpu.engine.wavefront import trace_fan

cfg_noref = dataclasses.replace(cfg, refine=False)
print(f"# production cfg, n={args.rays} P={P} narrow={cfg.compact_narrow} "
      f"agg_cap={cfg.agg_cap} replay_cap={cfg.replay_cap}", file=sys.stderr)


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.2f} ms/pulse", flush=True)
    return best / P


def pulse_args(i):
    return jax.tree.map(
        lambda a: a[i],
        (batch.rot, batch.pos, batch.vel, batch.rx_geom, batch.rx_pos,
         batch.tx_origin, batch.tx_dir, batch.times),
    )


def mk_trace_only():
    @jax.jit
    def f():
        def g(i):
            rot, pos, vel, rxg, rxp, txo, txd, t = pulse_args(i)
            scene = animate_packed(base, rot, pos, vel, cfg.cluster_size)
            fan = generate_fan_c(cfg.num_rays, (txd[0], txd[1]), spec.kwargs()["tx_span"], dtype=jnp.float32)
            res = trace_fan(scene, rxg, txo, fan, cfg_noref)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(res))
        return jax.lax.map(g, jnp.arange(P))
    return f


def mk_full(use_cfg, with_agg):
    one_pulse, aggregate = make_pulse_fn(base, use_cfg, **spec.kwargs())

    @jax.jit
    def f():
        def g(i):
            rot, pos, vel, rxg, rxp, txo, txd, t = pulse_args(i)
            ref = jax.tree.map(lambda a: a[i], batch.refine) if use_cfg.refine else None
            res, power, doppler, delay = one_pulse(rot, pos, vel, rxg, rxp, txo, txd, t, refine=ref)
            tot = jnp.sum(power) + jnp.sum(doppler) + jnp.sum(delay)
            tot = tot + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(res))
            if with_agg:
                out = aggregate(res, power, doppler, delay)
                tot = tot + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out.agg))
            return tot
        return jax.lax.map(g, jnp.arange(P))
    return f


a = timed("trace_fan only (4 segs, narrow, no post)", mk_trace_only())
b = timed("+ postprocess (one_pulse, refine off)", mk_full(cfg_noref, False))
c = timed("+ aggregation", mk_full(cfg_noref, True))
d = timed("+ ds replay (full production)", mk_full(cfg, True))
print(f"# postprocess marginal: {(b - a) * 1000:.2f} ms/pulse")
print(f"# aggregation marginal: {(c - b) * 1000:.2f} ms/pulse")
print(f"# replay marginal:      {(d - c) * 1000:.2f} ms/pulse")
print("POST2 DONE")
