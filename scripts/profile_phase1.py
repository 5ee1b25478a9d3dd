"""Phase-1 internal decomposition on the TPU: where does `_tile_candidates`
time go at the 63^3 production fan?  (lanes-last edition)

Stages are cumulative re-implementations of the function's internals
(level-0 slab -> +level-1 member re-test -> +reduce/top_k -> +level-2
slab -> +reductions -> full), each timed under a lax.map over P pulses
with the standard i*1e-12 tmin perturbation that defeats hoisting
(profile_r3.py).  The last stage is asserted identical to the real
`_tile_candidates` so the copies cannot drift silently.

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
ap.add_argument("--cluster-size", type=int, default=128)
ap.add_argument("--candidates", type=int, default=64)
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--sub-tiles", type=int, default=8)
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=63)
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=2, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=args.cluster_size,
    ray_tile=args.ray_tile, candidates=args.candidates, sub_tiles=args.sub_tiles,
    mt_group=8, mt_union=True, cand_order="near",
    p1_fanout=8, p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
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
rt, st, k_max = cfg.ray_tile, cfg.sub_tiles, cfg.candidates
l_pad = -(-l // rt) * rt


def padded(a):  # lanes-last [3, l] / [l]
    pad = l_pad - a.shape[-1]
    if not pad:
        return a
    return jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)


fan_c = fan0.T  # [3, l]
o_in = padded(jnp.broadcast_to(batch.tx_origin[0][:, None], fan_c.shape))
d_in = padded(fan_c)
tm_in = padded(jnp.full((l,), 0.005, jnp.float32))
mn_in, mx_in = sc0.aabb_mn, sc0.aabb_mx
print(f"# cs={args.cluster_size} cand={k_max} rt={rt} st={st} n={args.rays} "
      f"C={mn_in.shape[0]} P={P}", file=sys.stderr)

_BIG = CT._BIG
_FANOUT = 8  # matches p1_fanout=8 production
_SUPER_K = 12
_FANOUT0 = CT._P1_FANOUT0
_SUPER_K0 = CT._P1_SUPER_K0
_L0_MIN_S = CT._P1_L0_MIN_S
_SEL_MODE = CT._P1_SEL_MODE


def stages(origin, direction, tmin, mn, mx, *, upto):
    """Cumulative phase-1 stages (mirror of CT._tile_candidates,
    lanes-last); `upto` picks how far to run.

    0 l0slab: [l, S0] level-0 box tests
    1 l1slab: + per-tile [tiles, rt, K0*f0] supergroup member re-test
    2 l1: + per-tile reduce + top_k(Ks)
    3 l2slab: + member gather + per-tile [rt, Ks*fanout] slab tests
    4 l2red: + overlap/tnear sub-block reductions + count
    5 full: + bits + top_k(k) + take_along_axis + padding  (== real fn)
    """
    l = origin.shape[1]
    c = mn.shape[0]
    f32 = jnp.float32
    o = origin.astype(f32)
    d = direction.astype(f32)
    alive = (d[0] * d[0] + d[1] * d[1] + d[2] * d[2]) > 0.0
    big = jnp.float32(_BIG)
    mnf, mxf = mn.astype(f32), mx.astype(f32)
    tiles = l // rt
    inv = 1.0 / jnp.where(d == 0.0, 1.0, d)
    tmin_f = tmin.astype(f32)

    def batch_slab(bmn, bmx):
        if bmn.ndim == 2:
            comp = lambda a, ax: a[ax]
            al_, tm_ = alive, tmin_f
            expand = lambda a: a[:, None]
            bsel = lambda a, ax: a[None, :, ax]
        else:
            comp = lambda a, ax: a[ax].reshape(tiles, rt)
            al_ = alive.reshape(tiles, rt)
            tm_ = tmin_f.reshape(tiles, rt)
            expand = lambda a: a[..., None]
            bsel = lambda a, ax: a[:, None, :, ax]
        shape = al_.shape + (bmn.shape[-2],)
        tn = jnp.full(shape, -big, f32)
        tf = jnp.full(shape, big, f32)
        for ax in range(3):
            oa = expand(comp(o, ax))
            ia = expand(comp(inv, ax))
            t1 = (bsel(bmn, ax) - oa) * ia
            t2 = (bsel(bmx, ax) - oa) * ia
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            inside = (oa >= bsel(bmn, ax)) & (oa <= bsel(bmx, ax))
            dz = expand(comp(d, ax)) == 0.0
            lo = jnp.where(dz, jnp.where(inside, -big, big), lo)
            hi = jnp.where(dz, jnp.where(inside, big, -big), hi)
            tn = jnp.maximum(tn, lo)
            tf = jnp.minimum(tf, hi)
        box_ok = jnp.all(jnp.isfinite(bmn) & jnp.isfinite(bmx) & (bmn <= bmx), axis=-1)
        ok = box_ok[None, :] if bmn.ndim == 2 else box_ok[:, None, :]
        ov = (tf >= tn) & (tf >= expand(tm_)) & expand(al_) & ok
        return ov, jnp.where(ov, jnp.maximum(tn, 0.0), jnp.float32(jnp.inf))

    fanout = _FANOUT
    s = -(-c // fanout)
    c_pad1 = s * fanout
    if c_pad1 > c:
        inf = jnp.float32(jnp.inf)
        mnp = jnp.concatenate([mnf, jnp.full((c_pad1 - c, 3), inf)], axis=0)
        mxp = jnp.concatenate([mxf, jnp.full((c_pad1 - c, 3), inf)], axis=0)
    else:
        mnp, mxp = mnf, mxf
    fin = jnp.isfinite(mnp[:, 0:1]) & jnp.isfinite(mxp[:, 0:1])
    s_mn = jnp.where(fin, mnp, big).reshape(s, fanout, 3).min(axis=1)
    s_mx = jnp.where(fin, mxp, -big).reshape(s, fanout, 3).max(axis=1)
    s_bad = s_mn[:, 0] > s_mx[:, 0]
    s_mn = jnp.where(s_bad[:, None], jnp.float32(jnp.inf), s_mn)
    s_mx = jnp.where(s_bad[:, None], jnp.float32(jnp.inf), s_mx)

    ks = min(_SUPER_K, s)
    assert s >= _L0_MIN_S, "profiler assumes the level-0 path (big scenes)"
    f0 = _FANOUT0
    s0 = -(-s // f0)
    s_pad0 = s0 * f0
    if s_pad0 > s:
        inf = jnp.float32(jnp.inf)
        smnp = jnp.concatenate([s_mn, jnp.full((s_pad0 - s, 3), inf)])
        smxp = jnp.concatenate([s_mx, jnp.full((s_pad0 - s, 3), inf)])
    else:
        smnp, smxp = s_mn, s_mx
    fin0 = jnp.isfinite(smnp[:, 0:1])
    z_mn = jnp.where(fin0, smnp, big).reshape(s0, f0, 3).min(axis=1)
    z_mx = jnp.where(fin0, smxp, -big).reshape(s0, f0, 3).max(axis=1)
    z_bad = z_mn[:, 0] > z_mx[:, 0]
    z_mn = jnp.where(z_bad[:, None], jnp.float32(jnp.inf), z_mn)
    z_mx = jnp.where(z_bad[:, None], jnp.float32(jnp.inf), z_mx)
    ov_z, _ = batch_slab(z_mn, z_mx)  # [l, S0]
    if upto == 0:
        return (jnp.sum(ov_z),)
    ov_z_t = jnp.any(ov_z.reshape(tiles, rt, s0), axis=1)
    k0 = min(_SUPER_K0, s0)
    z_count = jnp.sum(ov_z_t, axis=1).astype(jnp.int32)
    _, z_order = jax.lax.top_k(ov_z_t.astype(jnp.int32) * (s0 - jnp.arange(s0)), k0)
    l0_over = z_count > k0
    sg_slots = (z_order[..., None] * f0 + jnp.arange(f0)).reshape(tiles, k0 * f0)
    sg_slots = jnp.minimum(sg_slots, s_pad0 - 1)
    ov_s1, _ = batch_slab(smnp[sg_slots], smxp[sg_slots])
    if upto == 1:
        return (jnp.sum(ov_s1),)
    ov_s_t = jnp.any(ov_s1, axis=1)
    nsl = k0 * f0
    s_count = jnp.sum(ov_s_t, axis=1).astype(jnp.int32)
    _, sel1 = jax.lax.top_k(ov_s_t.astype(jnp.int32) * (nsl - jnp.arange(nsl)), min(ks, nsl))
    s_order = jnp.take_along_axis(sg_slots, sel1, axis=1)
    ks = min(ks, nsl)
    s_over = l0_over | (s_count > ks)
    if upto == 2:
        return (jnp.sum(s_order), jnp.sum(s_over))
    members = (s_order[..., None] * fanout + jnp.arange(fanout)).reshape(tiles, ks * fanout)
    members = jnp.minimum(members, c_pad1 - 1)
    cmn = mnp[members]
    cmx = mxp[members]
    ov_c, tnear_c = batch_slab(cmn, cmx)
    if upto == 3:
        return (jnp.sum(ov_c), jnp.sum(jnp.where(jnp.isfinite(tnear_c), tnear_c, 0.0)))
    rs = rt // st
    kf = ks * fanout
    ov_sb = jnp.any(ov_c.reshape(tiles, st, rs, kf), axis=2)
    tnear_sb = jnp.min(tnear_c.reshape(tiles, st, rs, kf), axis=2)
    if _SEL_MODE & 2:
        ov_sb, tnear_sb = jax.lax.optimization_barrier((ov_sb, tnear_sb))
    ov_ct = jnp.any(ov_sb, axis=1)
    tnear_t = jnp.min(tnear_sb, axis=1)
    count = jnp.sum(ov_ct, axis=1).astype(jnp.int32)
    if upto == 4:
        return (jnp.sum(ov_ct), jnp.sum(jnp.where(jnp.isfinite(tnear_t), tnear_t, 0.0)), jnp.sum(count))
    weights = (1 << jnp.arange(st, dtype=jnp.int32))[None, :, None]
    bits_all = jnp.sum(ov_sb.astype(jnp.int32) * weights, axis=1)
    k_eff = min(k_max, kf)
    if _SEL_MODE & 1:
        tb = jax.lax.bitcast_convert_type(tnear_t, jnp.int32)
        ikey = jnp.where(ov_ct, jnp.int32(2**31 - 1) - tb, jnp.int32(0))
        _, sel = jax.lax.top_k(ikey, k_eff)
    else:
        tkey = jnp.where(ov_ct, tnear_t, jnp.float32(jnp.inf))
        _, sel = jax.lax.top_k(-tkey, k_eff)
    order = jnp.take_along_axis(members, sel, axis=1).astype(jnp.int32)
    bits = jnp.take_along_axis(bits_all, sel, axis=1).astype(jnp.int32)
    if k_eff < k_max:
        order = jnp.pad(order, ((0, 0), (0, k_max - k_eff)))
        bits = jnp.pad(bits, ((0, 0), (0, k_max - k_eff)))
    else:
        order = order[:, :k_max]
        bits = bits[:, :k_max]
    over = s_over | (count > k_eff)
    meta = jnp.stack([jnp.minimum(count, k_eff), over.astype(jnp.int32)], axis=1)
    pos = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    count_col = meta[:, 0:1]
    last = jnp.maximum(jnp.minimum(pos, count_col - 1), 0)
    order = jnp.where(count_col > 0, jnp.take_along_axis(order, last, axis=1), 0)
    bits = jnp.where(pos < count_col, bits, 0)
    return order, meta, bits


# drift guard: stage-5 copy must equal the real function
ref = CT._tile_candidates(o_in, d_in, tm_in, mn_in, mx_in, rt, st, k_max,
                          p1_fanout=8, p1_super_k=12)
got = stages(o_in, d_in, tm_in, mn_in, mx_in, upto=5)
for a, b, nm in zip(got, ref, ("cand", "meta", "bits")):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
print("# drift guard ok: stage-5 == _tile_candidates", file=sys.stderr)


def timed(name, fn, n=3):
    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:.1f} ms total, {best / P * 1000:.3f} ms/pulse", flush=True)
    return best / P


prev = 0.0
for upto, name in ((0, "l0 slab [l,S0]"), (1, "+ l1 slab"), (2, "+ l1 reduce/top_k"),
                   (3, "+ l2 slab [t,rt,kf]"), (4, "+ l2 reductions"),
                   (5, "full (bits+top_k+gather)")):
    def mk(upto=upto):
        @jax.jit
        def f():
            def g(i):
                out = stages(o_in, d_in, tm_in + i * 1e-12, mn_in, mx_in, upto=upto)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in out)
            return jax.lax.map(g, jnp.arange(P, dtype=jnp.float32))
        return f
    ms = timed(f"p1 upto {upto}: {name}", mk())
    print(f"#   marginal: {(ms - prev) * 1000:.3f} ms/pulse")
    prev = ms
print("P1PROF DONE")
