"""Round-3 TPU decomposition: where do the ~16 ms/pulse actually go?

Fixes the r2 profiler's hoisting trap (a lax.map whose body ignores the
loop variable times ONE execution): every stage body consumes the loop
index through a numerically-negligible tmin perturbation (i * 1e-12 m).

Stages: animate | phase-1 | segment-1 kernel (primary fan) | bounce
kernel (the REAL segment-2 lane state after one wavefront iteration) |
trace_fan at 1/2/3/4 segments (per-segment marginal cost) | full pulse.
Also prints phase-1 workload counters for primary vs bounce tiles (the
bounce-segment fat-list problem, VERDICT r2 item 2).

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
ap.add_argument("--cluster-size", type=int, default=256)
ap.add_argument("--candidates", type=int, default=64)
ap.add_argument("--mt-group", type=int, default=4)
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--sub-tiles", type=int, default=8)
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=31)
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=args.cluster_size,
    ray_tile=args.ray_tile, candidates=args.candidates, sub_tiles=args.sub_tiles,
    mt_group=args.mt_group, mt_union=True, cand_order="near",
    fan_order="raster", refine=False, replay_cap=16384,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses
print(
    f"# cs={args.cluster_size} cand={args.candidates} G={args.mt_group} rt={args.ray_tile} st={args.sub_tiles} n={args.rays}",
    file=sys.stderr,
)

import dataclasses

from rts_tpu.engine.animate import animate_packed
from rts_tpu.engine.cpi import make_pulse_fn
from rts_tpu.engine.fan import generate_fan
from rts_tpu.engine.wavefront import _init_state, _process_hit, _process_miss, trace_fan
from rts_tpu.ops import closest_hit_clustered
from rts_tpu.ops.cluster_trace import _tile_candidates

one_pulse, aggregate = make_pulse_fn(base, cfg, **spec.kwargs())


def timed(name, fn, *a, n=3):
    out = fn(*a)
    s = jax.tree.leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        s = jax.tree.leaves(out)[0]
        float(jnp.sum(s.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.2f} ms/pulse")
    return best / P


floor = timed("floor (trivial map)", jax.jit(lambda x: jax.lax.map(lambda y: y * 2.0, x)), batch.times)

# shared per-pulse geometry (pulse 0's scene; the i-perturbation defeats hoisting)
sc0 = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size)
fan0 = generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"])
l = fan0.shape[0]
orig0 = jnp.broadcast_to(batch.tx_origin[0], fan0.shape)
tmin0 = jnp.full((l,), 0.005, jnp.float32)
l_pad = -(-l // cfg.ray_tile) * cfg.ray_tile


def padded(a, fill=0.0):
    pad = l_pad - a.shape[0]
    return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])


@jax.jit
def stage_animate(b):
    def f(x):
        rot, pos, vel, t0 = x
        sc = animate_packed(base, rot, pos, vel, cfg.cluster_size)
        return jnp.sum(sc.tri_pack) * (1.0 + 0.0 * t0)

    return jax.lax.map(f, (b.rot, b.pos, b.vel, b.times))


timed("animate (pack+refit)", stage_animate, batch)


@jax.jit
def stage_phase1(o, d, t, mn, mx):
    def f(i):
        c, m, bb, *_ = _tile_candidates(
            o, d, t + i * 1e-12, mn, mx, cfg.ray_tile, cfg.sub_tiles, cfg.candidates
        )
        return jnp.sum(c) + jnp.sum(m) + jnp.sum(bb)

    return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))


timed("phase1 (primary fan)", stage_phase1, padded(orig0), padded(fan0), padded(tmin0), sc0.aabb_mn, sc0.aabb_mx)


def mk_kernel(o, d, t):
    @jax.jit
    def stage(pack, mn, mx, txo):
        def f(i):
            h = closest_hit_clustered(
                o, d, t + i * 1e-12, pack, mn, mx, txo,
                cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
                group_size=cfg.group_size, super_size=cfg.super_size,
                sub_tiles=cfg.sub_tiles, candidates=cfg.candidates,
                mt_group=cfg.mt_group,
            )
            return jnp.sum(h.t) + jnp.sum(h.tri)

        return jax.lax.map(f, jnp.arange(P, dtype=jnp.float32))

    return stage


timed("seg1 kernel+phase1 (primary)", mk_kernel(orig0, fan0, tmin0), sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0])

# --- REAL bounce-segment lane state: run ONE wavefront iteration
rxg0 = jax.tree.map(lambda x: x[0], batch.rx_geom)


@jax.jit
def seg2_state():
    state = _init_state(cfg, batch.tx_origin[0], fan0, jnp.float32)
    from rts_tpu.engine.wavefront import TraceBuffers

    bufs = TraceBuffers(
        path=jnp.full((cfg.ray_total, cfg.depth_total), -1, jnp.int32),
        rcs=jnp.full((cfg.ray_total, cfg.depth_total, 2), -1000000.0, jnp.float32),
    )
    live = jnp.where(state.active[:, None], state.direction, 0.0)
    hit = closest_hit_clustered(
        state.origin, live, state.tmin, sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx,
        batch.tx_origin[0], cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
        group_size=cfg.group_size, super_size=cfg.super_size,
        sub_tiles=cfg.sub_tiles, candidates=cfg.candidates, mt_group=cfg.mt_group,
    )
    hm = state.active & hit.found
    mm = state.active & ~hit.found
    state = _process_miss(state, mm, rxg0, batch.tx_origin[0], cfg)
    state, bufs = _process_hit(state, bufs, hit, hm, sc0, batch.tx_origin[0], cfg, l)
    live2 = jnp.where(state.active[:, None], state.direction, 0.0)
    return state.origin, live2, state.tmin


o2, d2, t2 = jax.tree.map(jax.block_until_ready, seg2_state())
alive2 = int(jnp.sum(jnp.sum(d2 * d2, axis=1) > 0))
print(f"# segment-2 live lanes: {alive2} of {d2.shape[0]}")
timed("seg2 kernel+phase1 (bounce)", mk_kernel(o2, d2, t2), sc0.tri_pack, sc0.aabb_mn, sc0.aabb_mx, batch.tx_origin[0])

# phase-1 workload: candidates + gated blocks, primary vs bounce
for name, (oo, dd, tt) in (("primary", (orig0, fan0, tmin0)), ("bounce", (o2, d2, t2))):
    lp = -(-oo.shape[0] // cfg.ray_tile) * cfg.ray_tile

    def pad2(a, fill=0.0):
        p = lp - a.shape[0]
        return jnp.concatenate([a, jnp.full((p,) + a.shape[1:], fill, a.dtype)])

    c, m, bb, *_ = _tile_candidates(
        pad2(oo), pad2(dd), pad2(tt), sc0.aabb_mn, sc0.aabb_mx,
        cfg.ray_tile, cfg.sub_tiles, cfg.candidates,
    )
    m = np.asarray(m)
    bits = np.asarray(bb)
    pop = np.unpackbits(bits.astype(np.uint8).reshape(-1, 1), axis=1).sum() if False else (
        np.bitwise_count(bits).sum() if hasattr(np, "bitwise_count")
        else bin(1)[0] and sum(bin(int(x)).count("1") for x in bits.ravel())
    )
    print(
        f"# {name}: tiles={m.shape[0]} cand/tile={m[:, 0].mean():.1f} "
        f"overflow={int(m[:, 1].sum())} gated-blocks/tile={pop / max(1, m.shape[0]):.1f} "
        f"(of {cfg.sub_tiles} x cand)"
    )

# --- marginal segment costs via trace_fan at 1..4 segments
def mk_tracefan(c):
    @jax.jit
    def stage(b):
        def f(x):
            rot, pos, vel, txo, txd, t0 = x
            sc = animate_packed(base, rot, pos, vel, c.cluster_size)
            fan = generate_fan(c.num_rays, (txd[0], txd[1]), spec.kwargs()["tx_span"], dtype=jnp.float32)
            res = trace_fan(sc, rxg0, txo, fan, c)
            return jnp.sum(res.ray_length) + jnp.sum(res.power) * (1.0 + 0.0 * t0)

        return jax.lax.map(f, (b.rot, b.pos, b.vel, b.tx_origin, b.tx_dir, b.times))

    return stage


prev = None
for k in range(1, cfg.max_refl_dev + 1):  # k=0 would make depth_total < 1
    c = dataclasses.replace(cfg, max_refl_dev=k)
    ms = timed(f"trace_fan {c.num_segments}seg", mk_tracefan(c), batch)
    if prev is not None:
        print(f"#   marginal segment: {(ms - prev) * 1000:.2f} ms/pulse")
    prev = ms


@jax.jit
def stage_full(b):
    def f(x):
        out = aggregate(*one_pulse(*x))
        return out

    return jax.lax.map(
        f, (b.rot, b.pos, b.vel, b.rx_geom, b.rx_pos, b.tx_origin, b.tx_dir, b.times)
    )


timed("full (trace+post+agg)", stage_full, batch)
