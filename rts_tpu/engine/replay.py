"""Extended-precision path replay: the f32 engine's route to the 1e-6 bar.

The reference is double precision end-to-end (ray_tracer.h:13-28 doubles;
triangle_mesh.cu:121-137 ``intersect_triangle_doubles``; aggregation.cu:
59-60 double delay/phase).  TPU f32 traversal quantises ray lengths at
~1e-4 m over km paths — 4+ orders above the 1e-6 rad phase bar at X band.
Refining only the winning hit's ``t`` cannot fix that: 1e-6 rad at 10 GHz
is ~5e-9 m of path, and the f32 *directions* alone perturb hit points by
~1e-4 m.  The whole continuous chain must be re-evaluated.

Design: the f32 wavefront makes every DISCRETE decision — which triangle
wins each segment (``TraceResult.tri_seq``), which receivers capture and
with which quadratic root (``cap_bits``/``cap_root0_bits``) — and this
module replays the CONTINUOUS quantities along that recorded chain in
double-single (hi+lo f32 pair, ~2^-48 relative) arithmetic:

    fan direction -> per-step ds Möller–Trumbore t -> reflect/refract ->
    receiver-sphere quadratic -> ray length / power legs / Doppler.

Cost is O(lanes x depth) vectorised jnp — noise next to traversal.  The
replay never changes a decision, so received/path/emit stay identical to
the f32 trace; only ray_length (as a ds pair), power and Doppler tighten.

Chain structure exploited (static per slot, from the reference's layout,
normal_shader.cu:191-281): refraction happens only at a chain's first
intersection (refl_depth == 0), so slot 0 lanes reflect at every recorded
step, slot 1 ("trapped") refracts at step 0, slot 2 ("exiting") refracts
at steps 0 and 1; all later steps reflect.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rts_tpu.core import ds
from rts_tpu.core.constants import SCENE_EPS, SCENE_EPS_R  # noqa: F401 (decision gates stay f32)
from rts_tpu.core.ds import DS, DS3
from rts_tpu.engine.types import TraceConfig

PI = np.pi


def _mmh(a, b):
    """One-hot contraction with per-call pinned HIGHEST precision: ds
    residuals ride these f32 dots, and a user's
    jax.default_matmul_precision('bfloat16') context would silently
    corrupt them past the 1e-6 contract (TPU-only; invisible on CPU)."""
    import jax

    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


class RefineExtras(NamedTuple):
    """Per-pulse ds residuals + fan rotation ([P, ...] leading pulse axis).

    The hi parts are the PulseBatch's existing f32 arrays; these are the
    float64-minus-float32 residuals split on the host (prepare_cpi), plus
    the composed fan rotation r1 @ rz (ray_tracer.cu:173-203) evaluated in
    f64 on the host — per-pulse scalars, so host cost is O(P).
    """

    rot_lo: jnp.ndarray  # [P, NT, 3, 3]
    pos_lo: jnp.ndarray  # [P, NT, 3]
    vel_lo: jnp.ndarray  # [P, NT, 3]
    txo_lo: jnp.ndarray  # [P, 3]
    rxc_lo: jnp.ndarray  # [P, NR, 3]
    rxr_lo: jnp.ndarray  # [P, NR]
    fan_rot_hi: jnp.ndarray  # [P, 3, 3]  (r1 @ rz, f64 -> hi)
    fan_rot_lo: jnp.ndarray  # [P, 3, 3]
    bore_hi: jnp.ndarray  # [P, 3]  boresight direction (num_rays == 1 fan)
    bore_lo: jnp.ndarray  # [P, 3]


def _ds_of(hi, lo) -> DS:
    return DS(jnp.asarray(hi, jnp.float32), jnp.asarray(lo, jnp.float32))


def _v3(hi, lo) -> DS3:
    """[..., 3] hi/lo arrays -> DS3 of [...] components."""
    return DS3(
        _ds_of(hi[..., 0], lo[..., 0]),
        _ds_of(hi[..., 1], lo[..., 1]),
        _ds_of(hi[..., 2], lo[..., 2]),
    )


def _v3_where(m, a: DS3, b: DS3) -> DS3:
    w = lambda p, q: DS(jnp.where(m, p.hi, q.hi), jnp.where(m, p.lo, q.lo))
    return DS3(w(a.x, b.x), w(a.y, b.y), w(a.z, b.z))


def _ds_where(m, a: DS, b: DS) -> DS:
    return DS(jnp.where(m, a.hi, b.hi), jnp.where(m, a.lo, b.lo))


def _fan_dirs_ds(cfg: TraceConfig, tx_span, fan_rot: DS3 | None, bore: DS3, f_idx):
    """Primary ray direction per lane in ds (mirrors engine/fan.py).

    ``f_idx``: [L] int32 global fan index; the beam-corner grid constants
    are static (tx_span is a static tuple), computed here in host f64.
    """
    n = cfg.num_rays
    if n == 1:
        return bore, bore  # (unnormalised direction, unit seg_dir) coincide

    az_span, el_span, launch_range = (float(v) for v in tx_span)
    bs = np.array(
        [np.cos(-el_span / 2) * np.cos(-az_span / 2),
         np.cos(-el_span / 2) * np.sin(-az_span / 2),
         np.sin(-el_span / 2)], np.float64,
    )
    be = np.array(
        [np.cos(el_span / 2) * np.cos(az_span / 2),
         np.cos(el_span / 2) * np.sin(az_span / 2),
         np.sin(el_span / 2)], np.float64,
    )
    step = np.array(
        [(be[0] * (1.0 + launch_range) - bs[0]) / (n - 1),
         (be[1] - bs[1]) / (n - 1),
         (be[2] - bs[2]) / (n - 1)], np.float64,
    )

    ix = (f_idx % n).astype(jnp.float32)  # exact for n < 2^24
    iy = ((f_idx // n) % n).astype(jnp.float32)
    iz = (f_idx // (n * n)).astype(jnp.float32)

    def comp(axis, idx):
        base = ds.from_f64(bs[axis])
        st = ds.from_f64(step[axis])
        return ds.add(DS(jnp.broadcast_to(base.hi, idx.shape), jnp.broadcast_to(base.lo, idx.shape)),
                      ds.mul(st, ds.ds(idx)))

    raw = DS3(comp(0, ix), comp(1, iy), comp(2, iz))
    unit = ds.v3_normalize(raw)
    # rotate by the composed (r1 @ rz) matrix: engine applies rz then r1
    # with an intermediate renormalise — a unit-magnitude no-op at ds
    # precision, so the composition is mathematically identical.
    r = fan_rot  # DS3 of rows? stored as 3x3: we pass a callable instead

    def rot_apply(mat_hi, mat_lo, v: DS3) -> DS3:
        out = []
        for i in range(3):
            row = DS3(
                _ds_of(mat_hi[..., i, 0], mat_lo[..., i, 0]),
                _ds_of(mat_hi[..., i, 1], mat_lo[..., i, 1]),
                _ds_of(mat_hi[..., i, 2], mat_lo[..., i, 2]),
            )
            out.append(ds.v3_dot(row, v))
        return DS3(*out)

    d = rot_apply(r[0], r[1], unit)
    return d, d  # after rotation |d| == 1 to ds rounding; seg_dir == d


def _gather_ds(hi, lo, idx) -> DS:
    return DS(hi[idx], lo[idx])


def _gather_v3(hi, lo, idx) -> DS3:
    """hi/lo [T, 3] + [L] indices -> DS3 of [L]."""
    h = hi[idx]
    l = lo[idx]
    return _v3(h, l)


def _onehot_ds(hi, lo, targ, nt) -> DS:
    """Per-lane values from tiny [NT] ds tables via one-hot contraction."""
    oh = (targ[:, None] == jnp.arange(nt, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return DS(_mmh(oh, hi.astype(jnp.float32)), _mmh(oh, lo.astype(jnp.float32)))


def _onehot_v3(hi, lo, targ, nt) -> DS3:
    oh = (targ[:, None] == jnp.arange(nt, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return DS3(
        DS(_mmh(oh, hi[:, 0].astype(jnp.float32)), _mmh(oh, lo[:, 0].astype(jnp.float32))),
        DS(_mmh(oh, hi[:, 1].astype(jnp.float32)), _mmh(oh, lo[:, 1].astype(jnp.float32))),
        DS(_mmh(oh, hi[:, 2].astype(jnp.float32)), _mmh(oh, lo[:, 2].astype(jnp.float32))),
    )


def _refract_ds(i: DS3, n: DS3, ior: DS):
    """OptiX refract in ds (mirrors engine/wavefront._refract non-strict)."""
    one = ds.ds(jnp.ones_like(i.x.hi))
    ndotv = ds.v3_dot(i, n)
    backface = (ndotv.hi + ndotv.lo) > 0.0
    eta = _ds_where(backface, ior, ds.div(one, ior))
    nn = _v3_where(backface, DS3(ds.neg(n.x), ds.neg(n.y), ds.neg(n.z)), n)
    neg_ndotv = _ds_where(backface, ds.neg(ndotv), ndotv)
    k = ds.sub(one, ds.mul(ds.mul(eta, eta), ds.sub(one, ds.mul(neg_ndotv, neg_ndotv))))
    k_pos = DS(jnp.maximum(k.hi, 0.0), jnp.where(k.hi > 0.0, k.lo, 0.0))
    coef = ds.add(ds.mul(eta, neg_ndotv), ds.sqrt(k_pos))
    r = ds.v3_sub(ds.v3_scale(i, eta), ds.v3_scale(nn, coef))
    return ds.v3_normalize(r)


def replay_refine(
    base,  # SceneBase with lo fields populated
    res,  # TraceResult from the f32 trace (decision record)
    cfg: TraceConfig,
    extras,  # per-pulse RefineExtras slice (no leading P axis)
    *,
    rot,  # [NT, 3, 3] f32 (hi)
    pos,  # [NT, 3] f32 (hi)
    vel,  # [NT, 3] f32 (hi)
    rx_geom,  # RxGeomDevice (f32 his)
    tx_origin,  # [3] f32 (hi)
    tx_span,  # static (az_span, el_span, launch_range)
    fan_block: int,  # rays per fan block (N^3, or the shard block)
    fan_offset,  # traced int32: first global fan index of this block
):
    """Re-evaluate ray_length/power/doppler along the recorded chains.

    Returns ``res`` with refined ray_length (+ ray_length_lo), power and
    doppler on received lanes; all other lanes and all discrete fields
    pass through untouched.

    When ``cfg.replay_cap`` is set (and smaller than the lane count), the
    received lanes are COMPACTED to the front of a cap-sized block first
    and only that block is replayed — received counts are typically a few
    hundred out of ~1e5 lanes, so this makes the replay ~free (measured:
    full-lane replay cost ~12 ms/pulse at 120k lanes on a v5e chip).
    Received lanes beyond the cap keep their f32 values.
    """
    total = res.ray_length.shape[0]
    cap = min(cfg.replay_cap, total) if cfg.replay_cap else total
    if cap < total:
        import jax

        from rts_tpu.engine.compact import received_first_idx, take_lanes

        # O(L) compaction of received lanes to the front (an argsort of
        # the received mask was ~2.5 ms/pulse at a 63^3 fan — docs/PERF.md
        # r4).  Same selected set as the stable argsort: the first ``cap``
        # received lanes in lane order.  Filler slots gather received=-1
        # junk rows whose replayed values are DROPPED at the write-back
        # (out-of-range scatter), so they can never touch a real lane.
        idx = received_first_idx(res.received, cap)
        sub = jax.tree.map(lambda a: take_lanes(a, idx), res)  # lanes-last
        sub = sub._replace(received=take_lanes(res.received, idx, fill=-1))
        out = _replay_core(
            base, sub, cfg, extras, rot=rot, pos=pos, vel=vel, rx_geom=rx_geom,
            tx_origin=tx_origin, tx_span=tx_span, fan_block=fan_block,
            fan_offset=fan_offset, lane_ids=idx,
        )
        return res._replace(
            ray_length=res.ray_length.at[idx].set(out.ray_length),
            ray_length_lo=res.ray_length_lo.at[idx].set(out.ray_length_lo),
            power=res.power.at[idx].set(out.power),
            doppler=res.doppler.at[idx].set(out.doppler),
        )
    return _replay_core(
        base, res, cfg, extras, rot=rot, pos=pos, vel=vel, rx_geom=rx_geom,
        tx_origin=tx_origin, tx_span=tx_span, fan_block=fan_block,
        fan_offset=fan_offset, lane_ids=None,
    )


def _replay_core(
    base,
    res,  # TraceResult rows to replay ([L] = full or compacted block)
    cfg: TraceConfig,
    extras,
    *,
    rot,
    pos,
    vel,
    rx_geom,
    tx_origin,
    tx_span,
    fan_block: int,
    fan_offset,
    lane_ids,  # None (rows ARE lanes 0..L-1) or [L] original lane ids
):
    lanes = res.ray_length.shape[0]
    f32 = jnp.float32
    nt = base.target_refl.shape[0]
    four_pi = ds.from_f64(4.0 * PI)
    one = ds.ds(jnp.ones((lanes,), f32))

    lane = jnp.arange(lanes, dtype=jnp.int32) if lane_ids is None else lane_ids.astype(jnp.int32)
    slot = lane // fan_block
    f_idx = fan_offset + (lane % fan_block)

    # --- primary direction (ds)
    bore = _v3(extras.bore_hi, extras.bore_lo)
    bore = DS3(*(DS(jnp.broadcast_to(c.hi, (lanes,)), jnp.broadcast_to(c.lo, (lanes,))) for c in bore))
    d_raw, _ = _fan_dirs_ds(
        cfg, tx_span, (extras.fan_rot_hi, extras.fan_rot_lo), bore, f_idx
    )
    direction = d_raw  # t of step 0 is parametric w.r.t. the unnormalised dir
    seg_dir = ds.v3_normalize(d_raw) if cfg.num_rays > 1 else d_raw

    txo = _v3(tx_origin.astype(f32), extras.txo_lo)
    txo = DS3(*(DS(jnp.broadcast_to(c.hi, (lanes,)), jnp.broadcast_to(c.lo, (lanes,))) for c in txo))
    origin = txo
    rl = ds.ds(jnp.zeros((lanes,), f32))
    power = ds.ds(jnp.ones((lanes,), f32))
    dop = ds.ds(jnp.zeros((lanes,), f32))
    refr_prev = ds.ds(jnp.ones((lanes,), f32))
    refr_cur = ds.ds(jnp.ones((lanes,), f32))

    rot_hi9 = rot.reshape(nt, 9).astype(f32)
    rot_lo9 = extras.rot_lo.reshape(nt, 9).astype(f32)

    w = res.tri_seq.shape[0]  # tri_seq is [W, L]
    for c in range(w):
        tri = res.tri_seq[c]
        have = tri >= 0
        tri_s = jnp.clip(tri, 0, base.tri_verts.shape[0] - 1)
        targ = jnp.clip(base.tri_target[tri_s], 0, nt - 1)

        # animated vertices in ds: v = R @ v_base + pos  (matches the f64
        # host animation semantics, animate.py / ray_tracer.cpp:1004-1014)
        oh = (targ[:, None] == jnp.arange(nt, dtype=jnp.int32)[None, :]).astype(f32)
        r9h = _mmh(oh, rot_hi9)  # [L, 9]
        r9l = _mmh(oh, rot_lo9)
        p_hi = _mmh(oh, pos.astype(f32))
        p_lo = _mmh(oh, extras.pos_lo.astype(f32))
        shift = _v3(p_hi, p_lo)

        def animate(corner):
            vb = _v3(base.tri_verts[tri_s, corner], base.tri_verts_lo[tri_s, corner])
            out = []
            for i in range(3):
                row = DS3(
                    _ds_of(r9h[:, 3 * i + 0], r9l[:, 3 * i + 0]),
                    _ds_of(r9h[:, 3 * i + 1], r9l[:, 3 * i + 1]),
                    _ds_of(r9h[:, 3 * i + 2], r9l[:, 3 * i + 2]),
                )
                out.append(ds.v3_dot(row, vb))
            return ds.v3_add(DS3(*out), shift)

        v0, v1, v2 = animate(0), animate(1), animate(2)
        e0 = ds.v3_sub(v1, v0)
        e1 = ds.v3_sub(v0, v2)
        nrm_g = ds.v3_cross(e1, e0)  # geometric normal (reference convention)

        q = ds.v3_sub(v0, origin)
        denom = ds.v3_dot(nrm_g, direction)
        t = ds.div(ds.v3_dot(nrm_g, q), denom)
        hp = ds.v3_add(origin, ds.v3_scale(direction, t))

        first = (c == 0)
        leg = ds.v3_sub(hp, txo) if first else ds.v3_sub(hp, origin)
        leg_sq = ds.v3_dot(leg, leg)
        spread = ds.div(one, ds.mul(leg_sq, DS(jnp.broadcast_to(four_pi.hi, (lanes,)), jnp.broadcast_to(four_pi.lo, (lanes,)))))
        power_new = spread if first else ds.mul(power, spread)

        # shading normal
        if cfg.interpolate_smooth:
            beta = ds.div(ds.v3_dot(direction, ds.v3_cross(q, e1)), denom)
            gamma = ds.div(ds.v3_dot(direction, ds.v3_cross(q, e0)), denom)
            alpha = ds.sub(ds.sub(one, beta), gamma)
            cn = [
                _v3(base.tri_corner_normals[tri_s, k], base.tri_corner_normals_lo[tri_s, k])
                for k in range(3)
            ]
            nrm_b = ds.v3_add(
                ds.v3_add(ds.v3_scale(cn[1], beta), ds.v3_scale(cn[2], gamma)),
                ds.v3_scale(cn[0], alpha),
            )
            # rotate the interpolated base normal (linear => order-free)
            rows = [
                DS3(
                    _ds_of(r9h[:, 3 * i + 0], r9l[:, 3 * i + 0]),
                    _ds_of(r9h[:, 3 * i + 1], r9l[:, 3 * i + 1]),
                    _ds_of(r9h[:, 3 * i + 2], r9l[:, 3 * i + 2]),
                )
                for i in range(3)
            ]
            nrm = DS3(*(ds.v3_dot(rows[i], nrm_b) for i in range(3)))
        else:
            nrm = nrm_g
        nrm = ds.v3_normalize(nrm)

        v_t = _onehot_v3(vel.astype(f32), extras.vel_lo.astype(f32), targ, nt)
        refl_c = _onehot_ds(base.target_refl, base.target_refl_lo, targ, nt)
        k0 = ds.v3_normalize(direction)

        # --- direction update: refract at this chain's static refraction
        # steps (slot 1: step 0; slot 2: steps 0 and 1), reflect otherwise
        refract_here = (slot >= 1) & (c == 0) | (slot == 2) & (c == 1) if cfg.refraction_on else jnp.zeros((lanes,), bool)

        refr_prev_new = refr_cur
        at_unity = refr_prev_new.hi == 1.0  # engine compares the f32 value
        targ_refr = _onehot_ds(base.target_refr, base.target_refr_lo, targ, nt)
        refr_cur_child = _ds_where(at_unity, targ_refr, one)
        ratio = ds.div(refr_cur_child, refr_prev_new)
        d_refr = _refract_ds(seg_dir, nrm, ratio)

        # reflect: r = i - 2 n (i.n), NOT renormalised (engine semantics)
        idn = ds.v3_dot(seg_dir, nrm)
        two_idn = ds.add(idn, idn)
        d_refl = ds.v3_sub(seg_dir, ds.v3_scale(nrm, two_idn))

        d_new = _v3_where(refract_here, d_refr, d_refl)
        k1 = ds.v3_normalize(d_new)

        # power factors: refracted share (1-|rc|) unless the reflection
        # budget is exhausted (normal_shader.cu:244-246); reflection * rc
        abs_rc = DS(jnp.abs(refl_c.hi), jnp.where(refl_c.hi < 0, -refl_c.lo, refl_c.lo))
        refr_share = ds.sub(one, abs_rc) if (1 < cfg.max_refl_dev) else one
        factor = _ds_where(refract_here, refr_share, refl_c)
        power_new = ds.mul(power_new, factor)

        dk = ds.v3_sub(k1, k0)
        dop_new = ds.add(dop, ds.v3_dot(v_t, dk))

        # masked chain-state update
        rl = _ds_where(have, ds.add(rl, t), rl)
        power = _ds_where(have, power_new, power)
        dop = _ds_where(have, dop_new, dop)
        origin = _v3_where(have, hp, origin)
        direction = _v3_where(have, d_new, direction)
        seg_dir = _v3_where(have, d_new, seg_dir)
        refr_prev = _ds_where(have, refr_prev_new, refr_prev)
        refr_cur = _ds_where(
            have, _ds_where(refract_here, refr_cur_child, refr_prev_new), refr_cur
        )

    # --- receiver capture legs (mirrors _process_miss, ds quadratic)
    four_pi_sq = ds.from_f64((4.0 * PI) ** 2)
    fps = DS(jnp.broadcast_to(four_pi_sq.hi, (lanes,)), jnp.broadcast_to(four_pi_sq.lo, (lanes,)))
    direct = (res.refl_depth == 0) & (res.refr_depth == 0)
    a_q = ds.v3_dot(direction, direction)
    for rx_i in range(rx_geom.num_rx):
        got = (res.cap_bits & (1 << rx_i)) != 0
        root0 = (res.cap_root0_bits & (1 << rx_i)) != 0
        cen = _v3(rx_geom.centre[rx_i].astype(f32), extras.rxc_lo[rx_i])
        cen = DS3(*(DS(jnp.broadcast_to(ci.hi, (lanes,)), jnp.broadcast_to(ci.lo, (lanes,))) for ci in cen))
        rad = _ds_of(rx_geom.radius[rx_i].astype(f32), extras.rxr_lo[rx_i])
        rad = DS(jnp.broadcast_to(rad.hi, (lanes,)), jnp.broadcast_to(rad.lo, (lanes,)))
        oc = ds.v3_sub(origin, cen)
        b_q = ds.v3_dot(oc, direction)  # = b/2
        c_q = ds.sub(ds.v3_dot(oc, oc), ds.mul(rad, rad))
        disc = ds.sub(ds.mul(b_q, b_q), ds.mul(a_q, c_q))  # (b/2)^2 - a c
        disc = DS(jnp.maximum(disc.hi, 0.0), jnp.where(disc.hi > 0.0, disc.lo, 0.0))
        sq = ds.sqrt(disc)
        num = _ds_where(root0, ds.sub(ds.neg(b_q), sq), ds.add(ds.neg(b_q), sq))
        t_cap = ds.div(num, a_q)
        ep = ds.v3_add(origin, ds.v3_scale(direction, t_cap))
        rng = _v3_where(direct, ds.v3_sub(ep, txo), ds.v3_sub(ep, origin))
        rng_sq = ds.v3_dot(rng, rng)
        p_dir = ds.div(one, ds.mul(fps, rng_sq))
        p_ind = ds.div(power, ds.mul(rng_sq, fps))
        power = _ds_where(got & direct, p_dir, power)
        power = _ds_where(got & ~direct, p_ind, power)
        dop = _ds_where(got & direct, ds.ds(jnp.zeros((lanes,), f32)), dop)
        rl = _ds_where(got, ds.add(rl, t_cap), rl)

    # --- merge refined values into received lanes only
    received = res.received >= 0
    out_dtype = res.ray_length.dtype
    rl_hi = jnp.where(received, rl.hi.astype(out_dtype), res.ray_length)
    rl_lo = jnp.where(received, rl.lo.astype(out_dtype), jnp.zeros_like(res.ray_length))
    p_out = jnp.where(received, (power.hi + power.lo).astype(out_dtype), res.power)
    d_out = jnp.where(received, (dop.hi + dop.lo).astype(out_dtype), res.doppler)
    return res._replace(
        ray_length=rl_hi, ray_length_lo=rl_lo, power=p_out, doppler=d_out
    )
