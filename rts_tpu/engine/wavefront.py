"""Wavefront multi-bounce tracer.

TPU-native replacement for the reference's recursive OptiX pipeline
(ray_generation -> rtTrace -> closest_hit -> recursive rtTrace,
ray_tracer.cu:144-255 / normal_shader.cu:128-340): instead of per-thread
recursion, all ray chains advance in lock-step as SoA lanes through a
fixed number of *segment* iterations; terminated lanes are masked, never
compacted (static shapes for XLA).

Refraction fan-out keeps the reference's static slot layout
(ray_tracer.cpp:608-633): a chain occupying lane ``l`` spawns its child
at lane ``l + N^3``, so primary chains live in slots [0, N^3), the
"trapped" first-refraction chains in [N^3, 2N^3) and the "exiting"
second-refraction chains in [2N^3, 3N^3).  Because the offset is uniform,
spawning is an array *shift*, not a scatter.  Slots >= 3N^3 exist only as
pre-filled path rows (normal_shader.cu:231-239) and stay empty, exactly
like the reference's result buffer.

Behaviour notes (gates mirror normal_shader.cu):
  * entry gate :134, path record :139-146, power legs :159-173,
    refraction :191-281, reflection :286-333.
  * The post-recursion ``end`` flag set at :336-338 is intentionally NOT
    modelled: it is written after the recursive trace returns, is never
    stored to the result buffer, and cannot influence any subsequent
    computation — the depth gates already stop the chain.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rts_tpu.core.constants import EARTH_RADIUS, SCENE_EPS, SCENE_EPS_R
from rts_tpu.core.vec import angle_in_range, dot3, dot3c, normalize3, normalize3c
from rts_tpu.engine.fan import generate_fan_c
from rts_tpu.engine.intersect import closest_hit_bruteforce
from rts_tpu.engine.types import DeviceScene, RxGeomDevice, TraceConfig

PI = jnp.pi


class LaneState(NamedTuple):
    """Shiftable per-chain state (the PerRayData analogue, SoA).

    LANES ARE THE LAST AXIS of every leaf; batched 3-vectors are
    components-major [3, L].  XLA:TPU tiles the two minor dims to
    (8, 128), so a [L, 3] leaf would pad 3 -> 128 lanes and every
    loop-carry/fusion-boundary materialisation would move ~42x the
    logical bytes (measured as the ~6 ms/segment hit-body block,
    docs/PERF.md r3q/r3r).  The uniform lanes-last rule keeps every
    lane-indexed tree op a plain ``leaf[..., idx]``.
    """

    origin: jnp.ndarray  # [3, L] prevHitPoint / segment origin
    direction: jnp.ndarray  # [3, L] double3-analogue propagation direction
    seg_dir: jnp.ndarray  # [3, L] the f32-valued OptiX ray.direction
    tmin: jnp.ndarray  # [L]
    ray_length: jnp.ndarray  # [L]
    power: jnp.ndarray  # [L]
    doppler: jnp.ndarray  # [L]
    refr_prev: jnp.ndarray  # [L] refrIndex.x
    refr_cur: jnp.ndarray  # [L] refrIndex.y
    refl_depth: jnp.ndarray  # [L] int32
    refr_depth: jnp.ndarray  # [L] int32
    slot_base: jnp.ndarray  # [L] int32 (maxRayIndex)
    received: jnp.ndarray  # [L] int32
    first_hit: jnp.ndarray  # [3, L]
    end: jnp.ndarray  # [L] bool
    active: jnp.ndarray  # [L] bool
    born: jnp.ndarray  # [L] bool — lane was ever spawned (vs zero-fill slot)
    # Discrete-decision record for the extended-precision replay
    # (engine/replay.py): the triangle hit at each chain step (children
    # inherit the parent's prefix through the spawn shift), and per-
    # receiver capture/root-choice bitmasks from the miss stage.
    tri_seq: jnp.ndarray  # [W, L] int32, -1 = no hit at that chain step
    cap_bits: jnp.ndarray  # [L] int32, bit rx set when the lane was captured by rx
    cap_root0_bits: jnp.ndarray  # [L] int32, bit rx set when the NEAR root captured


class TraceBuffers(NamedTuple):
    """Column-indexed side outputs (full ray_total width, lanes last)."""

    path: jnp.ndarray  # [D, R] int32 (dbuf_targ_intersect)
    rcs: jnp.ndarray  # [2, D, R] (dbuf_rcs_angle; leading axis az/el)


class TraceResult(NamedTuple):
    """Per-pulse outputs; lanes are the LAST axis of every leaf."""

    ray_length: jnp.ndarray  # [R]
    power: jnp.ndarray  # [R]
    doppler: jnp.ndarray  # [R]
    received: jnp.ndarray  # [R] int32
    refl_depth: jnp.ndarray  # [R] int32
    refr_depth: jnp.ndarray  # [R] int32
    first_hit: jnp.ndarray  # [3, R]
    prev_hit: jnp.ndarray  # [3, R]
    path: jnp.ndarray  # [D, R] int32
    rcs: jnp.ndarray  # [2, D, R]
    # chain record for ds replay (engine/replay.py); zeros/-1 when unused
    tri_seq: jnp.ndarray  # [W, R] int32
    cap_bits: jnp.ndarray  # [R] int32
    cap_root0_bits: jnp.ndarray  # [R] int32
    ray_length_lo: jnp.ndarray  # [R] ds residual of ray_length (replay output)


# ---------------------------------------------------------------------------


def _q32(x, cfg: TraceConfig):
    """Reference float32-narrowing points (no-op unless strict_parity
    with a wider engine dtype)."""
    if cfg.strict_parity:
        return x.astype(jnp.float32).astype(x.dtype)
    return x


def _reflect(i, n, cfg: TraceConfig):
    """OptiX reflect on the float3 ray (normal_shader.cu:296).
    Components-major [3, L] vectors."""
    if cfg.strict_parity:
        i32, n32 = i.astype(jnp.float32), n.astype(jnp.float32)
        return (i32 - 2.0 * n32 * dot3c(i32, n32)[None]).astype(i.dtype)
    return i - 2.0 * n * dot3c(i, n)[None]


def _refract(i, n, ior, cfg: TraceConfig):
    """OptiX refract semantics (normal_shader.cu:212); float32 under
    strict parity.  [3, L] vectors.  Returns (unit direction, ok)."""
    dtype = i.dtype
    if cfg.strict_parity:
        i = i.astype(jnp.float32)
        n = n.astype(jnp.float32)
        ior = ior.astype(jnp.float32)
    ndotv = dot3c(i, n)
    backface = ndotv > 0.0
    eta = jnp.where(backface, ior, 1.0 / ior)
    nn = jnp.where(backface, -n, n)
    neg_ndotv = jnp.where(backface, -ndotv, ndotv)
    k = 1.0 - eta * eta * (1.0 - neg_ndotv * neg_ndotv)
    ok = k >= 0.0
    r = eta[None] * i - (eta * neg_ndotv + jnp.sqrt(jnp.where(ok, k, 0.0)))[None] * nn
    r = r / jnp.sqrt(jnp.maximum(dot3c(r, r), 1e-300 if r.dtype == jnp.float64 else 1e-30))[None]
    return r.astype(dtype), ok


# module-level alias so profilers can stub the transcendental
# (scripts/profile_hit4.py) — always jnp.arctan2 in production
_atan2 = jnp.arctan2


def _cart_to_sph2(v):
    azi = _atan2(v[1], v[0])
    ele = _atan2(v[2], jnp.sqrt(v[0] ** 2 + v[1] ** 2))
    return azi, ele


def _scatter_col(buf, col, value, mask):
    """Masked per-lane write buf[col[l], l] = value[l] without scatter:
    one-hot select over the (small, static) leading depth axis.

    ``buf`` is [D, L] (path) or [2, D, L] (rcs); ``value`` is [L] or
    [2, L] correspondingly; ``col``/``mask`` are [L]."""
    d = buf.shape[-2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, buf.shape[-1]), 0)
    sel = mask[None, :] & (cols == col[None, :])
    if buf.ndim == 3:
        sel = sel[None]
        value = value[:, None, :]
    else:
        value = value[None, :]
    return jnp.where(sel, value.astype(buf.dtype), buf)


# ---------------------------------------------------------------------------
# hit processing (closest_hit program analogue)


def _shade_rows(table, tri):
    """Hit-shading attribute fetch: ``table[tri].T`` ([T, F] rows ->
    [F, L] components-major).  The reference reads these through OptiX's
    hardware SBT records (/root/reference/normal_shader.cu:139-194); on
    TPU the plain row gather fuses into its consumers and measures ~0 in
    situ (docs/PERF.md r3h — a winner-cluster block-gather alternative
    was measured −3% and excised in r4).  Module-level so profilers can
    stub it (scripts/profile_insitu.py)."""
    return table[tri].T


def _process_hit(state: LaneState, bufs: TraceBuffers, hit, hit_mask, scene: DeviceScene, tx_origin, cfg: TraceConfig, n3: int, spawn: bool = True):
    """``spawn=False`` statically skips the refraction-spawn machinery.
    Only valid for segments where no spawn can occur (after the first
    two: spawning needs refl_depth == 0 and refr_depth < max_refr_dev,
    both impossible from segment 3 on) — the skipped updates are all
    gated by a provably all-False mask there, so results are identical;
    it also lets narrow lane blocks trace without the full-fan n3 lane
    shifts (see trace_fan's compact_narrow path)."""
    l = state.origin.shape[1]
    dtype = state.origin.dtype

    tri = jnp.clip(hit.tri, 0, scene.tri_target.shape[0] - 1)
    from rts_tpu.engine.animate import ClusterScene as _CS

    fused = isinstance(scene, _CS) and cfg.interpolate_smooth
    if fused:
        if hit.shade is not None:
            # Kernel-emitted winner shade fields (cfg.shade_emit): exact
            # copies of shade_pack[tri] for found lanes, zeros for no-hit
            # lanes — whose shade-derived values are all gate-masked
            # below, so results are identical to the gather path.
            shade = hit.shade
        else:
            # ONE [T, 10] gather yields both the per-lane target id and
            # the corner normals (animate.SceneBase.shade_pack) — the
            # separate [T] + [T, 3, 3] gathers share indices but XLA
            # keeps them apart
            shade = _shade_rows(scene.shade_pack, tri)  # [10, L]
        targ = shade[9].astype(jnp.int32)
        fused_cn = shade[:9].reshape(3, 3, -1)  # [corner, comp, L]
    else:
        targ = scene.tri_target[tri]
    nt = scene.target_refl.shape[0]
    targ_safe = jnp.clip(targ, 0, nt - 1)

    # Per-lane target attributes: XLA lowers many-index gathers from tiny
    # [NT] operands pathologically; a one-hot contraction runs at memory
    # speed.  Gate on NT so huge target counts keep the gather.
    # Lanes-last: the one-hot is [NT, L] and results are [L] / [k, L].
    if nt == 1:
        # single-target scene: every gated lane's attrs are target 0's —
        # the one-hot contraction degenerates to a broadcast (bit-equal:
        # the [1, L] one-hot is all ones, so the dot returns a[0] exactly)
        def _tgather(a):
            a2 = a.astype(dtype).reshape(-1)
            if a.ndim == 1:
                return jnp.broadcast_to(a2[0], targ_safe.shape)
            return jnp.broadcast_to(a2[:, None], (a2.shape[0], targ_safe.shape[0]))

    elif nt <= 16:
        _oh = (jnp.arange(nt, dtype=jnp.int32)[:, None] == targ_safe[None, :]).astype(dtype)

        def _tgather(a):  # [NT] or [NT, k] -> per-lane values [L] / [k, L]
            # precision pinned: integer target attrs ride this f32 dot
            a2 = a.astype(dtype).reshape(nt, -1)
            out = jnp.matmul(a2.T, _oh, precision=jax.lax.Precision.HIGHEST)
            return out[0] if a.ndim == 1 else out

    else:

        def _tgather(a):
            g = a.astype(dtype)[targ_safe]  # [L] or [L, k]
            return g if a.ndim == 1 else g.T

    gate = (
        hit_mask
        & ~state.end
        & (
            (state.refr_depth < cfg.max_refr_dev)
            | (state.refl_depth < cfg.max_refl_dev - 1)
        )
    )

    # --- path record (normal_shader.cu:139-146)
    col = state.refl_depth + state.refr_depth
    rec = gate & (state.refr_depth != 1) & (col < cfg.depth_total)
    path = bufs.path
    path = path.at[:, :l].set(_scatter_col(path[:, :l], col, targ, rec))

    # --- chain record for ds replay: every gated hit, indexed by its
    # chain step (col is monotone along a chain; children inherit the
    # updated prefix below since tri_seq rides in LaneState)
    tri_seq = _scatter_col(state.tri_seq, col, hit.tri, gate)

    # --- geometry update
    hit_t = _q32(hit.t, cfg)
    hit_t = jnp.where(gate, hit_t, 0.0)
    hit_point = state.origin + hit_t[None] * state.direction
    ray_length = state.ray_length + hit_t

    first = gate & (state.refl_depth == 0) & (state.refr_depth == 0)
    leg = jnp.where(first, hit_point - tx_origin[:, None], hit_point - state.origin)
    leg_sq = dot3c(leg, leg)
    eps = jnp.where(first, SCENE_EPS, SCENE_EPS_R)
    ok_leg = jnp.sqrt(leg_sq) >= eps
    four_pi = 4.0 * PI
    power = state.power
    power = jnp.where(first & ok_leg, 1.0 / (leg_sq * four_pi), power)
    power = jnp.where(gate & ~first & ok_leg, power / (leg_sq * four_pi), power)
    end = state.end | (gate & ~ok_leg)

    first_hit = jnp.where(first, hit_point, state.first_hit)
    origin = jnp.where(gate, hit_point, state.origin)

    # --- shading normal (triangle_mesh.cu:174-194)
    from rts_tpu.engine.animate import ClusterScene

    if isinstance(scene, ClusterScene):
        if cfg.interpolate_smooth:
            # Interpolate BASE normals, rotate the result per lane —
            # rotation is linear so this equals rotating all T normals
            # per pulse, at O(lanes) instead of O(T).
            cn = fused_cn  # [corner, comp, L] (fused shade_pack gather)
            nrm_b = (
                cn[1] * hit.beta[None]
                + cn[2] * hit.gamma[None]
                + cn[0] * (1.0 - hit.beta - hit.gamma)[None]
            )  # [3, L]
            r9 = _tgather(scene.rot.reshape(-1, 9))  # [9, L]
            nrm = jnp.stack(
                [
                    r9[0] * nrm_b[0] + r9[1] * nrm_b[1] + r9[2] * nrm_b[2],
                    r9[3] * nrm_b[0] + r9[4] * nrm_b[1] + r9[5] * nrm_b[2],
                    r9[6] * nrm_b[0] + r9[7] * nrm_b[1] + r9[8] * nrm_b[2],
                ],
                axis=0,
            )
        else:
            # geometric normal = pack rows 0:3, already world-frame
            nrm = scene.tri_pack[0:3, :][:, tri]
    elif cfg.interpolate_smooth:
        cn = jnp.moveaxis(scene.tri_corner_normals[tri], 0, -1)  # [corner, comp, L]
        nrm = (
            cn[1] * hit.beta[None]
            + cn[2] * hit.gamma[None]
            + cn[0] * (1.0 - hit.beta - hit.gamma)[None]
        )
    else:
        nrm = scene.tri_n[tri].T
    nrm = normalize3c(nrm)
    nrm = jnp.where(jnp.isfinite(nrm), nrm, 0.0)
    normal_f = _q32(nrm, cfg)

    v_targ = _tgather(scene.target_vel)  # [3, L]
    refl_c = _tgather(scene.target_refl)  # [L]
    k0 = normalize3c(state.direction)
    k0 = jnp.where(jnp.isfinite(k0), k0, 0.0)
    if cfg.rcs_angles:
        # arrival angles, recorded only when some RCS model reads them
        # (normal_shader.cu:259-265; aspect-free models ignore the
        # buffer, so prepare_cpi statically elides all of this trig)
        k0_azi, k0_ele = _cart_to_sph2(k0)

    # --- refraction spawn (normal_shader.cu:191-281)
    refr_prev_new = state.refr_cur  # prd_refr.refrIndex.x = old .y
    spawn_mask = jnp.zeros((l,), bool)
    rcs = bufs.rcs
    child = None
    if cfg.refraction_on and spawn:
        can = gate & (jnp.abs(refl_c) != 1.0) & (state.refr_depth < cfg.max_refr_dev) & (state.refl_depth == 0)
        refr_cur_child = jnp.where(refr_prev_new == 1.0, _tgather(scene.target_refr), 1.0)
        ratio = _q32(refr_cur_child / refr_prev_new, cfg)
        refr_dir, refr_ok = _refract(state.seg_dir, normal_f, ratio, cfg)
        spawn_mask = can & refr_ok

        child_power = jnp.where(state.refl_depth + 1 < cfg.max_refl_dev, power * (1.0 - jnp.abs(refl_c)), power)
        k1 = normalize3c(refr_dir)
        child_doppler = state.doppler + dot3c(v_targ, k1 - k0)
        child = LaneState(
            origin=hit_point,
            direction=refr_dir.astype(dtype),
            seg_dir=refr_dir.astype(dtype),
            tmin=jnp.full((l,), SCENE_EPS, dtype),
            ray_length=ray_length,
            power=child_power,
            doppler=child_doppler,
            refr_prev=refr_prev_new,
            refr_cur=refr_cur_child,
            refl_depth=state.refl_depth,
            refr_depth=state.refr_depth + 1,
            slot_base=state.slot_base + n3,
            received=state.received,
            first_hit=first_hit,
            end=end,
            active=jnp.ones((l,), bool),
            born=jnp.ones((l,), bool),
            tri_seq=tri_seq,
            cap_bits=state.cap_bits,
            cap_root0_bits=state.cap_root0_bits,
        )

        if cfg.rcs_angles:
            # refraction RCS angles -> child row (normal_shader.cu:259-265)
            k1_azi, k1_ele = _cart_to_sph2(-k1)
            rcs_val = jnp.stack([k0_azi + k1_azi, k0_ele + k1_ele], axis=0)  # [2, L]
            child_col = state.refl_depth + state.refr_depth  # refl + (refr+1) - 1
            rcs = rcs.at[:, :, :l].set(
                _scatter_col(
                    rcs[:, :, :l],
                    _shift_down(child_col, n3),
                    _shift_down(rcs_val, n3),
                    _shift_down(spawn_mask, n3),
                )
            )

        # pre-filled trapped/exiting path rows (normal_shader.cu:221-239)
        prefill = spawn_mask & (state.refr_depth == 0) & (state.slot_base == 0)
        r_rows = path.shape[1]
        ncols = cfg.depth_total
        # trapped row (slot 1): every column
        pf_rows = _shift_to_rows(prefill, n3, r_rows)
        pf_targ = _shift_to_rows(targ, n3, r_rows)
        path = jnp.where(pf_rows[None, :], pf_targ[None, :], path)
        # exiting rows (slots j+2, j = 0..max_refl_dev-1): columns 0..j+1
        for j in range(cfg.max_refl_dev):
            off = (j + 2) * n3
            if off >= r_rows:
                break
            rows = _shift_to_rows(prefill, off, r_rows)
            tg = _shift_to_rows(targ, off, r_rows)
            width = min(j + 2, ncols)
            colsel = jax.lax.broadcasted_iota(jnp.int32, (ncols, 1), 0) < width
            path = jnp.where(rows[None, :] & colsel, tg[None, :], path)

    # --- reflection (normal_shader.cu:286-333)
    refl_depth = jnp.where(gate, state.refl_depth + 1, state.refl_depth)
    refr_prev = jnp.where(gate, refr_prev_new, state.refr_prev)
    refr_cur = jnp.where(gate, refr_prev_new, state.refr_cur)

    do_refl = gate & (refl_depth < cfg.max_refl_dev)
    refl_dir = _reflect(state.seg_dir, normal_f, cfg)
    power = jnp.where(do_refl, power * refl_c, power)
    k1r = normalize3c(refl_dir)
    k1r = jnp.where(jnp.isfinite(k1r), k1r, 0.0)
    doppler = state.doppler + jnp.where(do_refl, dot3c(v_targ, k1r - k0), 0.0)
    direction = jnp.where(do_refl, refl_dir.astype(dtype), state.direction)
    seg_dir = jnp.where(do_refl, refl_dir.astype(dtype), state.seg_dir)
    tmin = jnp.where(do_refl, jnp.asarray(SCENE_EPS_R, dtype), state.tmin)

    if cfg.rcs_angles:
        # reflection RCS angles -> own row (normal_shader.cu:319-326)
        k1r_azi, k1r_ele = _cart_to_sph2(-k1r)
        rcs_val_r = jnp.stack([k0_azi + k1r_azi, k0_ele + k1r_ele], axis=0)  # [2, L]
        rcs_col_r = (refl_depth - 1) + state.refr_depth
        rcs = rcs.at[:, :, :l].set(_scatter_col(rcs[:, :, :l], rcs_col_r, rcs_val_r, do_refl))

    # No outer hit_mask merge is needed: every field above is computed
    # with an inner where on ``gate`` (or a mask contained in it), so it
    # already equals the incoming state wherever gate is false — the
    # single exception is ``active`` (do_refl would wrongly kill
    # non-hit lanes), folded into one expression here.
    merged = LaneState(
        origin=origin,
        direction=direction,
        seg_dir=seg_dir,
        tmin=tmin,
        ray_length=ray_length,
        power=power,
        doppler=doppler,
        refr_prev=refr_prev,
        refr_cur=refr_cur,
        refl_depth=refl_depth,
        refr_depth=state.refr_depth,
        slot_base=state.slot_base,
        received=state.received,
        first_hit=first_hit,
        end=end,
        active=do_refl | (~hit_mask & state.active),
        born=state.born,
        tri_seq=tri_seq,
        cap_bits=state.cap_bits,
        cap_root0_bits=state.cap_root0_bits,
    )

    # spawn children via uniform +n3 shift
    if cfg.refraction_on and spawn:
        shifted_child = jax.tree.map(partial(_shift_down, n3=n3), child)
        shifted_spawn = _shift_down(spawn_mask, n3=n3)
        # lanes-last everywhere: a [L] mask broadcasts against every leaf
        merged = jax.tree.map(
            lambda c, s: jnp.where(shifted_spawn, c, s), shifted_child, merged
        )

    return merged, TraceBuffers(path=path, rcs=rcs)


def _shift_down(a, n3: int):
    """Move lane l to lane l + n3 (zero-fill the first n3 lanes).
    Lanes are the LAST axis of every leaf."""
    pad = jnp.zeros(a.shape[:-1] + (n3,), a.dtype)
    return jnp.concatenate([pad, a[..., :-n3]], axis=-1)


def _shift_to_rows(a, off: int, rows: int):
    """Place a[..., i] at lane i+off of a zero buffer with ``rows`` lanes."""
    take = min(rows - off, a.shape[-1])
    parts = [jnp.zeros(a.shape[:-1] + (off,), a.dtype), a[..., :take]]
    used = off + take
    if used < rows:
        parts.append(jnp.zeros(a.shape[:-1] + (rows - used,), a.dtype))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# miss processing (miss program analogue, ray_tracer.cu:260-477)


def _process_miss(state: LaneState, miss_mask, rx: RxGeomDevice, tx_origin, cfg: TraceConfig):
    dtype = state.origin.dtype
    four_pi_sq = (4.0 * PI) * (4.0 * PI)

    m_entry = miss_mask & ~state.end  # gate evaluated once (cu:266)

    ray_length = state.ray_length
    power = state.power
    doppler = state.doppler
    received = state.received
    end = state.end
    cap_bits = state.cap_bits
    cap_root0_bits = state.cap_root0_bits

    d = state.direction  # [3, L]
    a_q = dot3c(d, d)

    for rx_i in range(rx.num_rx):
        c = rx.centre[rx_i][:, None]  # [3, 1]
        o = state.origin
        b_q = 2.0 * dot3c(o - c, d)
        c_q = dot3c(o, o) + dot3c(c, c) - 2.0 * dot3c(o, c) - rx.radius[rx_i] ** 2
        disc = b_q * b_q - 4.0 * a_q * c_q
        has = m_entry & (disc > 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b_q - sq) / (2.0 * a_q)
        t1 = (-b_q + sq) / (2.0 * a_q)

        # acceptance windows with pole-wrapped second region (cu:342-388)
        # — per-receiver scalars, identical for both quadratic roots
        max_t1 = rx.max_theta[rx_i]
        min_t1 = rx.min_theta[rx_i]
        max_p1 = rx.max_phi[rx_i]
        min_p1 = rx.min_phi[rx_i]
        max_t2, min_t2, max_p2, min_p2 = max_t1, min_t1, max_p1, min_p1

        w_low = min_p1 < -PI / 2
        max_t2 = jnp.where(w_low, max_t2 + PI, max_t2)
        min_t2 = jnp.where(w_low, min_t2 + PI, min_t2)
        max_p2 = jnp.where(w_low, -PI - min_p1, max_p2)
        min_p2 = jnp.where(w_low, -PI / 2, min_p2)
        min_p1 = jnp.where(w_low, -PI / 2, min_p1)

        w_high = max_p1 > PI / 2
        max_t2 = jnp.where(w_high, max_t2 + PI, max_t2)
        min_t2 = jnp.where(w_high, min_t2 + PI, min_t2)
        min_p2 = jnp.where(w_high, PI - max_p1, min_p2)
        max_p2 = jnp.where(w_high, PI / 2, max_p2)
        max_p1 = jnp.where(w_high, PI / 2, max_p1)

        if not cfg.strict_parity:
            # Per-bound sin/cos (scalar work) for the sector-form window
            # test below — the per-lane transcendentals drop out entirely.
            win_sc = [
                (jnp.sin(a), jnp.cos(a), jnp.sin(b), jnp.cos(b),
                 jnp.sin(a) * jnp.cos(b) - jnp.cos(a) * jnp.sin(b))
                for (a, b) in ((min_t1, max_t1), (min_p1, max_p1),
                               (min_t2, max_t2), (min_p2, max_p2))
            ]

        def _sector(u, v, sc):
            """angle_in_range(atan2(v, u), a, b) without the atan2.

            With theta = atan2(v, u):  u*sin(a) - v*cos(a) = r*sin(a-theta)
            carries the sign of wrap_angle(a - theta) (sign(sin w) ==
            sign(w) on (-pi, pi)), so the reference test
            wrap(a-t)*wrap(b-t) < 0  &  |wrap(a-t) - wrap(b-t)| < pi
            (core/vec.py angle_in_range, ray_tracer.cu:60-69) becomes two
            cross-product sign tests — the second via sign(wa - wb) ==
            sign(wa) (opposite signs given the first) and
            sin(wa - wb) == sin(a - b), a per-receiver scalar.  Equal to
            the reference test in real arithmetic except on the
            measure-zero set wrap(a-t) = +-pi (wa == 0 there, so the
            sector form is conservatively False while angle_in_range can
            return True); both are False wherever any other sine is 0."""
            sa, ca, sb, cb, sab = sc
            wa = u * sa - v * ca
            wb = u * sb - v * cb
            return (wa * wb < 0.0) & (wa * sab > 0.0)

        def _root_captured(ti):
            okt = (ti >= 0.0) & (ray_length + ti > SCENE_EPS) & (ray_length + ti > SCENE_EPS_R)
            ep = o + ti[None] * d
            rel = ep - c
            if cfg.strict_parity:
                theta = _atan2(
                    rel[1].astype(jnp.float32), rel[0].astype(jnp.float32)
                ).astype(dtype)
                phi = _atan2(
                    rel[2].astype(jnp.float32),
                    jnp.sqrt(rel[1] ** 2 + rel[0] ** 2).astype(jnp.float32),
                ).astype(dtype)

                # fold phi into [-pi/2, pi/2] (cu:332-340)
                low = phi < -PI / 2
                theta = jnp.where(low, theta + PI, theta)
                phi = jnp.where(low, -PI - phi, phi)
                high = phi > PI / 2
                theta = jnp.where(high, theta + PI, theta)
                phi = jnp.where(high, PI - phi, phi)

                in_win = (
                    angle_in_range(theta, min_t1, max_t1) & angle_in_range(phi, min_p1, max_p1)
                ) | (
                    angle_in_range(theta, min_t2, max_t2) & angle_in_range(phi, min_p2, max_p2)
                )
            else:
                # Sector-form windows on the capture point: theta on the
                # (x, y) pair, phi on (rho, z) with rho = hypot(x, y) >= 0
                # (so phi is already in [-pi/2, pi/2] — the reference's
                # phi fold above is a no-op and is elided here).  x = y =
                # 0 (capture through the sphere pole) maps to the
                # reference's atan2(0, 0) = 0 by substituting the theta=0
                # direction vector.
                x, yy, z = rel[0], rel[1], rel[2]
                rho = jnp.sqrt(x * x + yy * yy)
                x = jnp.where((x == 0.0) & (yy == 0.0), jnp.ones_like(x), x)
                in_win = (
                    _sector(x, yy, win_sc[0]) & _sector(rho, z, win_sc[1])
                ) | (
                    _sector(x, yy, win_sc[2]) & _sector(rho, z, win_sc[3])
                )
            return okt & in_win

        cap0 = has & _root_captured(t0)
        cap1 = has & _root_captured(t1)
        cap = cap0 | cap1
        t_cap = jnp.where(cap0, t0, t1)  # t0 <= t1 always, so min when both

        end = end | cap  # set before the epsilon gates (cu:396)

        ep = state.origin + t_cap[None] * d
        direct = (state.refl_depth == 0) & (state.refr_depth == 0)
        rx_range_direct = ep - tx_origin[:, None]
        rx_range_ind = ep - state.origin
        len_dir = jnp.sqrt(dot3c(rx_range_direct, rx_range_direct))
        len_ind = jnp.sqrt(dot3c(rx_range_ind, rx_range_ind))

        cap_dir = cap & direct & (len_dir >= SCENE_EPS)
        cap_ind = cap & ~direct & (len_ind >= SCENE_EPS_R)

        power = jnp.where(cap_dir, 1.0 / (four_pi_sq * dot3c(rx_range_direct, rx_range_direct)), power)
        doppler = jnp.where(cap_dir, 0.0, doppler)
        power = jnp.where(cap_ind, power / (dot3c(rx_range_ind, rx_range_ind) * four_pi_sq), power)
        got = cap_dir | cap_ind
        ray_length = jnp.where(got, ray_length + t_cap, ray_length)
        received = jnp.where(got, rx_i, received)
        # replay record: which receivers contributed a capture leg, and
        # whether the NEAR quadratic root was the accepted one
        bit = jnp.int32(1 << rx_i)
        cap_bits = jnp.where(got, cap_bits | bit, cap_bits)
        cap_root0_bits = jnp.where(got & cap0, cap_root0_bits | bit, cap_root0_bits)

    # Earth-sphere termination (cu:438-477)
    e = miss_mask & ~end
    o = state.origin
    b_q = 2.0 * dot3c(o, d)
    c_q = dot3c(o, o) - EARTH_RADIUS**2
    disc = b_q * b_q - 4.0 * a_q * c_q
    has = e & (disc > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    for t_e in ((-b_q - sq) / (2.0 * a_q), (-b_q + sq) / (2.0 * a_q)):
        valid = has & (t_e >= 0.0) & (state.ray_length > 0.0)
        ray_length = jnp.where(valid, ray_length + t_e, ray_length)
        end = end | valid

    active = jnp.where(miss_mask, False, state.active)
    return state._replace(
        ray_length=ray_length,
        power=power,
        doppler=doppler,
        received=received,
        end=end,
        active=active,
        cap_bits=cap_bits,
        cap_root0_bits=cap_root0_bits,
    )


# ---------------------------------------------------------------------------
# driver


def _lane_sort_key(state: LaneState) -> jnp.ndarray:
    """uint32 sort key: bit 31 = dead; below that, interleaved Morton of
    the bounce DIRECTION (5 bits/axis, major) and ORIGIN (5 bits/axis,
    minor).  Secondary rays share origins (the hit surface) but scatter
    in direction, so direction must dominate the tile grouping for the
    re-formed 256-ray tiles to have compact frusta."""
    o = state.origin  # [3, L]
    live = state.active
    big = jnp.asarray(3.0e38, o.dtype)
    lo = jnp.min(jnp.where(live, o, big), axis=1)
    hi = jnp.max(jnp.where(live, o, -big), axis=1)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    qo = jnp.clip((o - lo[:, None]) / span[:, None] * 31.0, 0.0, 31.0).astype(jnp.uint32)
    d = normalize3c(state.direction)
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    qd = jnp.clip((d + 1.0) * 15.5, 0.0, 31.0).astype(jnp.uint32)

    def spread5(v):  # interleave 5 bits with stride 3
        v = (v | (v << 8)) & jnp.uint32(0x0100F)
        v = (v | (v << 4)) & jnp.uint32(0x10C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x1249249)
        return v

    def morton5(q):
        return (spread5(q[0]) << 2) | (spread5(q[1]) << 1) | spread5(q[2])

    code = (morton5(qd) << 15) | morton5(qo)
    return jnp.where(live, code, jnp.uint32(1) << 31 | code)


def _init_state(cfg: TraceConfig, tx_origin, dirs, dtype) -> LaneState:
    n3 = dirs.shape[1]  # dirs [3, F] components-major
    lanes = 3 * n3 if cfg.refraction_on else n3  # only chains that can exist
    zeros3 = jnp.zeros((3, lanes), dtype)
    direction = zeros3.at[:, :n3].set(dirs)
    seg = _q32(normalize3c(dirs), cfg)
    seg_dir = zeros3.at[:, :n3].set(seg)
    active = jnp.zeros((lanes,), bool).at[:n3].set(True)
    return LaneState(
        origin=jnp.broadcast_to(tx_origin[:, None], (3, lanes)).astype(dtype),
        direction=direction,
        seg_dir=seg_dir,
        tmin=jnp.full((lanes,), SCENE_EPS, dtype),
        ray_length=jnp.zeros((lanes,), dtype),
        power=jnp.zeros((lanes,), dtype),
        doppler=jnp.zeros((lanes,), dtype),
        refr_prev=jnp.ones((lanes,), dtype),
        refr_cur=jnp.ones((lanes,), dtype),
        refl_depth=jnp.zeros((lanes,), jnp.int32),
        refr_depth=jnp.zeros((lanes,), jnp.int32),
        slot_base=jnp.zeros((lanes,), jnp.int32),
        received=jnp.full((lanes,), -1, jnp.int32),
        first_hit=zeros3,
        end=jnp.zeros((lanes,), bool),
        active=active,
        born=active,
        tri_seq=jnp.full((cfg.tri_seq_width, lanes), -1, jnp.int32),
        cap_bits=jnp.zeros((lanes,), jnp.int32),
        cap_root0_bits=jnp.zeros((lanes,), jnp.int32),
    )


def trace_fan(
    scene: DeviceScene,
    rx: RxGeomDevice,
    tx_origin,
    fan_dirs,  # [3, F] primary ray directions (a full fan or a shard block)
    cfg: TraceConfig,
) -> TraceResult:
    """Trace an arbitrary block of primary rays through all bounces.

    The result width is ``slot_multiplier * F`` lanes (lanes-last on every
    leaf) — when ``fan_dirs`` is the full N^3 fan this is the reference's
    ``rayTotal`` buffer layout (ray_tracer.cpp:626); when it is a shard of
    the fan, each device produces the same layout over its block, and the
    pulse-level result is reassembled by an all-gather + slot-major
    interleave (parallel/).
    """
    dtype = scene[0].dtype  # tri_p0 (DeviceScene) or tri_pack (ClusterScene)
    tx_origin = jnp.asarray(tx_origin, dtype)
    n3 = fan_dirs.shape[1]

    # Morton-tile the fan so each 256-ray traversal tile is a compact
    # angular patch instead of a thin strip; results are inverse-permuted
    # back to the reference launch order below (bit-identical).
    fan_perm = None
    if (
        cfg.accel == "cluster"
        and cfg.fan_tiling
        and n3 == cfg.rays_per_fan
        and cfg.num_rays > 4
    ):
        from rts_tpu.engine.fan import fan_tile_perm

        fan_perm = fan_tile_perm(cfg.num_rays, cfg.fan_order)
        fan_dirs = fan_dirs[:, jnp.asarray(fan_perm)]
    ray_total = cfg.slot_multiplier * n3
    state = _init_state(cfg, tx_origin, fan_dirs, dtype)
    bufs = TraceBuffers(
        path=jnp.full((cfg.depth_total, ray_total), -1, jnp.int32),
        rcs=jnp.full((2, cfg.depth_total, ray_total), -1000000.0, dtype),
    )

    if cfg.accel == "cluster":
        from rts_tpu.accel.cluster import cluster_aabbs
        from rts_tpu.engine.animate import ClusterScene
        from rts_tpu.ops import closest_hit_clustered, pack_tri_fields

        if isinstance(scene, ClusterScene):
            # animate_packed already produced the kernel-native layout
            tri_pack, mn, mx = scene.tri_pack, scene.aabb_mn, scene.aabb_mx
        else:
            # DeviceScene fallback: pack + refit on the fly
            tri_pack = pack_tri_fields(
                scene.tri_n, scene.tri_c1, scene.tri_c0, scene.tri_e1, scene.tri_e0, scene.tri_np0
            )
            mn, mx = cluster_aabbs(
                scene.tri_p0, scene.tri_e0, scene.tri_e1, cfg.cluster_size, xp=jnp,
                tri_target=scene.tri_target,
            )

        # Kernel-epilogue shade emit (TraceConfig.shade_emit): only when
        # the scene pack carries the 10 static shade rows and the smooth-
        # shading consumer exists; falls back to the XLA row gather in
        # _process_hit otherwise (hit.shade is None).
        emit_shade = (
            cfg.shade_emit
            and cfg.interpolate_smooth
            and int(tri_pack.shape[0]) == 32
        )

        def hit_fn(origin, direction, tmin):
            return closest_hit_clustered(
                origin,
                direction,
                tmin,
                tri_pack,
                mn,
                mx,
                tx_origin,  # near-to-far group order from the Tx
                emit_shade=emit_shade,
                cluster_size=cfg.cluster_size,
                ray_tile=cfg.ray_tile,
                group_size=cfg.group_size,
                super_size=cfg.super_size,
                sub_tiles=cfg.sub_tiles,
                candidates=cfg.candidates,
                mt_group=cfg.mt_group,
                mt_union=cfg.mt_union,
                mt_tail=cfg.mt_tail,
                mt_prune=cfg.mt_prune,
                resident_cap=cfg.resident_cap,
                cand_order=cfg.cand_order,
                p1_fanout=cfg.p1_fanout,
                p1_super_k=cfg.p1_super_k,
                p1_fanout0=cfg.p1_fanout0,
                p1_super_k0=cfg.p1_super_k0,
                interpret=cfg.interpret,
                components=True,  # [3, L] engine layout, no transposes
            )

    else:

        def hit_fn(origin, direction, tmin):
            # brute path (tests / tiny scenes): row-layout adapter
            return closest_hit_bruteforce(
                origin.T,
                direction.T,
                tmin,
                scene.tri_p0,
                scene.tri_e0,
                scene.tri_e1,
                scene.tri_n,
                scene.tri_c1,
                scene.tri_c0,
                scene.tri_np0,
                tri_chunk=cfg.tri_chunk,
            )

    def body(_, carry, spawn=True):
        state, bufs = carry
        # Zero the direction of terminated/unborn lanes: their hit results
        # are never consumed (hit/miss masks AND with active), and a zero
        # direction lets the clustered kernel's slab test drop them from
        # every tile — segments after most lanes die become nearly free.
        live_dir = jnp.where(state.active, state.direction, 0.0)
        hit = hit_fn(state.origin, live_dir, state.tmin)
        hit_mask = state.active & hit.found
        miss_mask = state.active & ~hit.found
        state = _process_miss(state, miss_mask, rx, tx_origin, cfg)
        state, bufs = _process_hit(state, bufs, hit, hit_mask, scene, tx_origin, cfg, n3, spawn=spawn)
        return state, bufs

    # Lane positions only matter while refraction children can spawn
    # (the l -> l + n3 shift): a primary's first intersection is segment 1
    # and the trapped child's is segment 2, so after ``spawn_segments``
    # the lane order is free.  Compact active lanes to the front then —
    # in the clustered kernel, the (many) fully-dead trailing tiles skip
    # every supercluster, so late segments cost ~nothing.  The
    # permutation is undone before results are assembled.
    lane_perm = None
    use_narrow = (
        cfg.compact_narrow > 1 or cfg.compact_narrow == -1
    ) and cfg.accel == "cluster"
    if (cfg.compact_lanes or use_narrow) and cfg.accel == "cluster":
        spawn_segments = min(cfg.num_segments, 2 if cfg.refraction_on else 1)
        for _ in range(spawn_segments):
            state, bufs = body(0, (state, bufs))
        remaining = cfg.num_segments - spawn_segments
    else:
        state, bufs = jax.lax.fori_loop(0, cfg.num_segments, body, (state, bufs))
        remaining = 0
    if remaining > 0 and cfg.compact_lanes:
        lanes_n = state.origin.shape[1]
        # Sort key: dead lanes last; live lanes Morton-ordered by their
        # bounce origin so the re-formed 256-ray tiles are spatially
        # compact for the remaining segments (secondary rays scatter).
        key = _lane_sort_key(state)
        lane_perm = jnp.argsort(key, stable=True)
        state = jax.tree.map(lambda a: a[..., lane_perm], state)
        bufs = TraceBuffers(
            path=bufs.path.at[:, :lanes_n].set(bufs.path[:, :lanes_n][:, lane_perm]),
            rcs=bufs.rcs.at[:, :, :lanes_n].set(bufs.rcs[:, :, :lanes_n][:, :, lane_perm]),
        )

    if remaining > 0:
        seg_body = body
        if use_narrow:
            # Tile-granular narrow segments: late bounce segments keep
            # ~1% of lanes alive (docs/PERF.md, model_reorder --bounces),
            # yet phase 1 and shading pay the full static lane count.
            # Once the LIVE ray tiles fit a narrow static budget, gather
            # just those tiles (plus the partial tail tile verbatim),
            # trace the narrow block, and scatter the rows back.  Tile
            # membership is preserved exactly — phase-1 lists, kernel
            # grid steps and per-lane shading see identical inputs — so
            # results are BIT-identical to the full-width trace; a
            # lax.cond falls back to full width while too many tiles
            # are alive (spawn machinery is inert here: children only
            # spawn in the first two segments, see spawn_segments).
            rt = cfg.ray_tile
            lanes_n = state.origin.shape[1]
            tiles_full = lanes_n // rt
            tail = lanes_n - tiles_full * rt
            if cfg.compact_narrow == -1:
                # AUTO: pick the live-tile budget from the tile count.
                # The budget must stay ABOVE the live-tile count of the
                # first post-spawn segments or the lax.cond falls back
                # to full width: the r3k 63³ sweep measured N=24/32
                # (budget 21/16) at 4.42/4.40e6 but N=48/64 (budget
                # 11/8) at 3.77e6 — seg-3 live tiles sit in (11, 16].
                # tiles//24 ≈ the measured-best 21-tile budget at 488
                # tiles; the floor of 8 keeps small fans (31³: 58
                # tiles) at their measured-best ~8-tile budget.
                nt = max(8, tiles_full // 24)
            else:
                nt = -(-tiles_full // cfg.compact_narrow)
            if nt < tiles_full:
                nl = nt * rt + tail

                def narrow_seg(carry):
                    state, bufs = carry
                    live_t = jnp.any(
                        state.active[: tiles_full * rt].reshape(tiles_full, rt),
                        axis=1,
                    )
                    # live tiles first (stable: by tile index within each
                    # class); take the first nt slots
                    t_order = jnp.argsort(~live_t, stable=True)[:nt]
                    rows = (
                        t_order[:, None] * rt + jnp.arange(rt, dtype=t_order.dtype)[None, :]
                    ).reshape(-1)
                    rows = jnp.concatenate(
                        [rows, jnp.arange(tiles_full * rt, lanes_n, dtype=rows.dtype)]
                    )
                    s_n = jax.tree.map(lambda a: a[..., rows], state)
                    b_n = TraceBuffers(path=bufs.path[..., rows], rcs=bufs.rcs[..., rows])
                    # spawn=False: required at narrow width (the +n3 child
                    # shift doesn't shape-check) and provably inert here —
                    # remaining segments start after spawn_segments
                    s_n, b_n = body(0, (s_n, b_n), spawn=False)
                    state2 = jax.tree.map(lambda a, b: a.at[..., rows].set(b), state, s_n)
                    bufs2 = TraceBuffers(
                        path=bufs.path.at[..., rows].set(b_n.path),
                        rcs=bufs.rcs.at[..., rows].set(b_n.rcs),
                    )
                    return state2, bufs2

                def seg_body(_, carry):
                    state, _bufs = carry
                    n_live = jnp.sum(state.active.astype(jnp.int32))
                    live_t = jnp.any(
                        state.active[: tiles_full * rt].reshape(tiles_full, rt),
                        axis=1,
                    )
                    # a fully-dead segment is a no-op (every update in the
                    # body is gated on active) — skip even the narrow trace
                    return jax.lax.cond(
                        n_live == 0,
                        lambda c: c,
                        lambda c: jax.lax.cond(
                            jnp.sum(live_t.astype(jnp.int32)) <= nt,
                            narrow_seg,
                            lambda c2: body(0, c2),
                            c,
                        ),
                        carry,
                    )

        state, bufs = jax.lax.fori_loop(0, remaining, seg_body, (state, bufs))

    if lane_perm is not None:
        lanes_n = state.origin.shape[1]
        inv = jnp.argsort(lane_perm)
        state = jax.tree.map(lambda a: a[..., inv], state)
        bufs = TraceBuffers(
            path=bufs.path.at[:, :lanes_n].set(bufs.path[:, :lanes_n][:, inv]),
            rcs=bufs.rcs.at[:, :, :lanes_n].set(bufs.rcs[:, :, :lanes_n][:, :, inv]),
        )

    # Assemble full-width results; lanes beyond the traced block stay at
    # their zero-fill values (ray_tracer.cu:227-240).
    lanes = state.origin.shape[1]
    r = ray_total

    def fill(x, fill_value):
        out = jnp.full(x.shape[:-1] + (r,), fill_value, x.dtype)
        return out.at[..., :lanes].set(x)

    def unpermute(res: TraceResult) -> TraceResult:
        if fan_perm is None:
            return res
        import numpy as np

        inv = np.argsort(fan_perm)
        rows = jnp.asarray(
            np.concatenate([s * n3 + inv for s in range(cfg.slot_multiplier)])
        )
        return jax.tree.map(lambda a: a[..., rows], res)

    return unpermute(TraceResult(
        ray_length=fill(state.ray_length, 0.0),
        power=fill(state.power, 0.0),
        doppler=fill(state.doppler, 0.0),
        received=fill(state.received, -1),
        refl_depth=fill(state.refl_depth, 0),
        refr_depth=fill(state.refr_depth, 0),
        first_hit=fill(state.first_hit, 0.0),
        # Never-spawned slots report the zero-fill prevHitPoint, not the
        # Tx origin their lane was initialised with (ray_tracer.cu:234).
        prev_hit=fill(jnp.where(state.born, state.origin, 0.0), 0.0),
        path=bufs.path,
        rcs=bufs.rcs,
        tri_seq=fill(state.tri_seq, -1),
        cap_bits=fill(state.cap_bits, 0),
        cap_root0_bits=fill(state.cap_root0_bits, 0),
        ray_length_lo=fill(jnp.zeros_like(state.ray_length), 0.0),
    ))


@partial(jax.jit, static_argnames=("cfg",))
def trace_pulse(
    scene: DeviceScene,
    rx: RxGeomDevice,
    tx_origin,
    tx_dir,
    tx_span,
    cfg: TraceConfig,
) -> TraceResult:
    """Trace one full pulse: the jitted analogue of rtContextLaunch3D
    (ray_tracer.cpp:1165) plus all recursive bounces."""
    dtype = scene.tri_p0.dtype
    fan = generate_fan_c(cfg.num_rays, tx_dir, tx_span, dtype=dtype)
    return trace_fan(scene, rx, tx_origin, fan, cfg)
