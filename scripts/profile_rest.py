"""In-situ decomposition of the non-kernel "rest" block at the FULL
production config (refine on, compact_narrow auto, agg_cap, replay_cap).

docs/PERF.md r4a attributes ~9-10 ms/pulse of the 63^3 budget to
"hit/miss shading" purely by subtraction; this measures each candidate
ingredient's marginal cost by patching it to a cheap stand-in and
re-timing the FULL one_pulse+aggregate under lax.map (values change —
timing only; stand-ins preserve liveness/control flow so the kernel and
narrow-segment behaviour stay representative):

  fan       generate_fan_c -> closed-over precomputed constant (hoists
            the per-pulse 250k-lane fan trig; bench pulses share tx_dir
            so behaviour is identical)
  trig      _cart_to_sph2 -> (v[0], v[2]) (kills 6 arctan2/lane/segment
            in the hit body's RCS angle records)
  miss      _process_miss -> active/end bookkeeping only (kills the rx
            quadratic + window tests but keeps lanes dying on miss so
            late-segment narrow behaviour is preserved; received stays
            -1 — the bench receives only ~63/250k lanes so the capped
            post/agg/replay blocks barely change)
  scatters  _scatter_col -> identity (kills path/rcs one-hot column
            writes and their [D,R]/[2,D,R] buffer round-trips)
  gather    gather_shade -> zeros (kills the [T,10] shade-pack row
            gather)
  norm      normalize3c in wavefront -> identity (kills the rsqrt
            chains on k0/k1/normals)
  compact   received_first_idx -> arange (kills the shared cumsum +
            searchsorted of the three cap paths)
  post      postprocess -> passthrough (kills gains/RCS/antenna math on
            the capped block)

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
ap.add_argument("--tris", type=int, default=1000000)
ap.add_argument("--stages", type=str, default="")  # comma list; default all
ap.add_argument("--trace-only", action="store_true",
                help="eval_shape each stage (patch-wiring smoke, no compile)")
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=args.tris, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=128,
    ray_tile=512, candidates=64, sub_tiles=8,
    mt_group=8, mt_union=True, cand_order="near",
    p1_fanout=8, p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
    compact_narrow=-1, fan_order="raster", refine=True, replay_cap=256,
    agg_cap=4096, tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

if jax.devices()[0].platform != "tpu":
    # CPU smoke (script-logic validation only): interpret-mode kernel
    import dataclasses

    cfg = dataclasses.replace(cfg, interpret=True)

import rts_tpu.engine.compact as compact_mod
import rts_tpu.engine.cpi as cpi_mod
import rts_tpu.engine.wavefront as wf
from rts_tpu.engine.fan import generate_fan_c

_orig = dict(
    fan=cpi_mod.generate_fan_c,
    trig=wf._cart_to_sph2,
    miss=wf._process_miss,
    scatters=wf._scatter_col,
    gather=wf._shade_rows,
    norm=wf.normalize3c,
    compact=compact_mod.received_first_idx,
    post=cpi_mod.postprocess,
)

# precomputed fan for the 'fan' stand-in (bench pulses share tx_dir)
_fan_const = generate_fan_c(
    cfg.num_rays,
    (batch.tx_dir[0, 0], batch.tx_dir[0, 1]),
    spec.kwargs()["tx_span"],
    dtype=jnp.float32,
)
_fan_const = jax.block_until_ready(_fan_const)


def _miss_min(state, miss_mask, rx, tx_origin, cfg_):
    return state._replace(
        end=state.end | miss_mask,
        active=jnp.where(miss_mask, False, state.active),
    )


_PATCH = dict(
    fan=lambda n, d, s, dtype=jnp.float32: _fan_const,
    trig=lambda v: (v[0], v[2]),
    miss=_miss_min,
    scatters=lambda buf, col, value, mask: buf,
    gather=lambda table, tri: jnp.zeros(
        (table.shape[1], tri.shape[0]), table.dtype
    ),
    norm=lambda v: v,
    compact=lambda received, cap: jnp.arange(cap, dtype=jnp.int32),
    post=lambda sub, **kw: (sub.power, sub.doppler, sub.ray_length / kw["cspeed"]),
)


def apply(disabled):
    cpi_mod.generate_fan_c = _PATCH["fan"] if "fan" in disabled else _orig["fan"]
    wf._cart_to_sph2 = _PATCH["trig"] if "trig" in disabled else _orig["trig"]
    wf._process_miss = _PATCH["miss"] if "miss" in disabled else _orig["miss"]
    wf._scatter_col = _PATCH["scatters"] if "scatters" in disabled else _orig["scatters"]
    wf._shade_rows = _PATCH["gather"] if "gather" in disabled else _orig["gather"]
    wf.normalize3c = _PATCH["norm"] if "norm" in disabled else _orig["norm"]
    compact_mod.received_first_idx = (
        _PATCH["compact"] if "compact" in disabled else _orig["compact"]
    )
    cpi_mod.postprocess = _PATCH["post"] if "post" in disabled else _orig["post"]


def build_fn():
    one_pulse, aggregate = cpi_mod.make_pulse_fn(base, cfg, **spec.kwargs())

    @jax.jit
    def f():
        def g(i):
            rot, pos, vel, rxg, rxp, txo, txd, t = jax.tree.map(
                lambda a: a[i],
                (batch.rot, batch.pos, batch.vel, batch.rx_geom, batch.rx_pos,
                 batch.tx_origin, batch.tx_dir, batch.times),
            )
            ref = jax.tree.map(lambda a: a[i], batch.refine)
            res, power, doppler, delay = one_pulse(
                rot, pos, vel, rxg, rxp, txo, txd, t, refine=ref
            )
            out = aggregate(res, power, doppler, delay)
            tot = jnp.sum(power) + jnp.sum(doppler) + jnp.sum(delay)
            tot = tot + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(res))
            tot = tot + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out.agg))
            return tot
        return jax.lax.map(g, jnp.arange(P))

    return f


def timed(name, fn, n=3):
    if args.trace_only:
        jax.eval_shape(fn)
        print(f"{name}: traced OK", flush=True)
        return 0.0
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


stages = list(_PATCH) if not args.stages else args.stages.split(",")
apply(set())
full = timed("full production pulse", build_fn())
marg = {}
for s in stages:
    apply({s})
    marg[s] = full - timed(f"  - {s}", build_fn())
apply(set(stages))
floor = timed("  - all of the above", build_fn())
apply(set())

print("# marginals (ms/pulse): " + ", ".join(
    f"{s} {marg[s] * 1000:.2f}" for s in stages
))
print(f"# all-stages combined: {(full - floor) * 1000:.2f} ms/pulse of "
      f"{full * 1000:.2f} total")
print("REST DONE")
