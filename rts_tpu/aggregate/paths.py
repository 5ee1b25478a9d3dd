"""Multipath coherent combining — sort + segmented reduction.

TPU-native replacement for the O(N^2) all-pairs CUDA kernels of
aggregation.cu:32-97: rays are grouped by (receiver, target-path row) with
one lexicographic sort, then voltages/delays/phases/Dopplers are combined
per group with segmented sums — O(N log N), static shapes, no host trip.

Semantics preserved exactly, including the reference's asymmetric
"direct transmission" rule (aggregation.cu:56): a ray with zero bounces
matches *every* received ray at its receiver, so direct rays read the
receiver-level aggregates instead of their path group's.

Outputs stay in lane space ([R] arrays + an ``emit`` mask) so everything
composes under jit/vmap; ``emit`` marks the unique-path representative
lanes that become Response objects (ray_tracer.cpp:1290-1321 dedup).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LaneAggregate(NamedTuple):
    npath: jnp.ndarray  # [R] number of coherently-combined rays
    power: jnp.ndarray  # [R] (mean voltage)^2  (kernel2, aggregation.cu:89)
    delay: jnp.ndarray  # [R] mean delay
    phase: jnp.ndarray  # [R] mean phase
    doppler: jnp.ndarray  # [R] mean Doppler
    path_match: jnp.ndarray  # [R] min matching lane (R+1 for invalid lanes)
    emit: jnp.ndarray  # [R] bool — this lane produces a Response
    # ds residual of ``phase``: one f32 holds phase to ~5e-7 rad at worst;
    # hosts add hi+lo into the (double) InterpPoint so the emitted phase
    # keeps the full double-single precision of the refined ray length.
    phase_lo: jnp.ndarray = None


def aggregate_lanes(
    received: jnp.ndarray,  # [R] int32, -1 = not received
    refl_depth: jnp.ndarray,  # [R] int32
    refr_depth: jnp.ndarray,  # [R] int32
    path: jnp.ndarray,  # [R, D] int32
    power: jnp.ndarray,  # [R] post-processed power
    ray_length: jnp.ndarray,  # [R]
    doppler: jnp.ndarray,  # [R] post-processed Doppler frequency
    num_rx: int,
    cspeed,
    carrier,
    ray_length_lo=None,  # [R] ds residual from the replay (engine/replay.py)
) -> LaneAggregate:
    r = received.shape[0]
    d = path.shape[1]
    fdtype = power.dtype

    valid = received >= 0
    w = valid.astype(fdtype)
    delay = ray_length / cspeed
    two_pi = 2.0 * jnp.pi
    phase_lo = None
    if fdtype == jnp.float32:
        # f32 mod of ~1e5-radian arguments quantises at ~0.03 rad; the
        # reference computes this in double (aggregation.cu:59-60).
        # Double-single arithmetic removes the reduction error on-chip;
        # with a replay-refined ds ray length the phase carries the full
        # ~2^-48 precision (hi + lo), else the floor is the f32 ray-length
        # quantisation.
        from rts_tpu.core import ds as _ds

        k = _ds.from_f64(two_pi * float(carrier) / float(cspeed))
        rl = _ds.DS(ray_length, ray_length_lo) if ray_length_lo is not None else _ds.ds(ray_length)
        ph = _ds.mod_two_pi(_ds.mul(rl, k))
        if ray_length_lo is not None:
            phase = -ph.hi
            phase_lo = -ph.lo
        else:
            phase = -(ph.hi + ph.lo)
    else:
        phase = -jnp.mod(delay * two_pi * carrier, two_pi)  # aggregation.cu:60
    volt = jnp.sqrt(power)

    # ---- lexicographic sort by (rx, path row); invalid lanes sort last
    rx_key = jnp.where(valid, received, num_rx).astype(jnp.int32)
    lane = jnp.arange(r, dtype=jnp.int32)
    keys = [rx_key] + [path[:, k] for k in range(d)]
    sorted_ops = jax.lax.sort(tuple(keys) + (lane,), num_keys=d + 1)
    perm = sorted_ops[-1]
    s_keys = sorted_ops[:-1]

    # ---- group ids: new segment where any key changes
    def diff(a):
        return a[1:] != a[:-1]

    boundary = jnp.zeros((r,), bool).at[1:].set(
        jnp.stack([diff(k) for k in s_keys], axis=0).any(axis=0)
    )
    seg = jnp.cumsum(boundary.astype(jnp.int32))

    # ---- segmented aggregates over valid lanes
    s_w = w[perm]
    s_volt = volt[perm] * s_w
    s_delay = delay[perm] * s_w
    s_phase = phase[perm] * s_w
    s_dopp = doppler[perm] * s_w

    g_n = jax.ops.segment_sum(s_w, seg, num_segments=r)
    g_volt = jax.ops.segment_sum(s_volt, seg, num_segments=r)
    g_delay = jax.ops.segment_sum(s_delay, seg, num_segments=r)
    g_phase = jax.ops.segment_sum(s_phase, seg, num_segments=r)
    g_dopp = jax.ops.segment_sum(s_dopp, seg, num_segments=r)
    g_phase_lo = (
        jax.ops.segment_sum(phase_lo[perm] * s_w, seg, num_segments=r)
        if phase_lo is not None
        else None
    )
    g_min = jax.ops.segment_min(
        jnp.where(valid[perm], perm, r + 1), seg, num_segments=r
    )

    # back to lane order
    inv = jnp.zeros((r,), jnp.int32).at[perm].set(jnp.arange(r, dtype=jnp.int32))
    lane_seg = seg[inv]
    grp_n = g_n[lane_seg]
    grp_volt = g_volt[lane_seg]
    grp_delay = g_delay[lane_seg]
    grp_phase = g_phase[lane_seg]
    grp_dopp = g_dopp[lane_seg]
    grp_min = g_min[lane_seg]
    grp_phase_lo = g_phase_lo[lane_seg] if phase_lo is not None else None

    # ---- receiver-level aggregates (for the direct-transmission rule)
    rx_seg = jnp.where(valid, received, num_rx).astype(jnp.int32)
    n_seg = num_rx + 1
    rx_n = jax.ops.segment_sum(w, rx_seg, num_segments=n_seg)
    rx_volt = jax.ops.segment_sum(volt * w, rx_seg, num_segments=n_seg)
    rx_delay = jax.ops.segment_sum(delay * w, rx_seg, num_segments=n_seg)
    rx_phase = jax.ops.segment_sum(phase * w, rx_seg, num_segments=n_seg)
    rx_dopp = jax.ops.segment_sum(doppler * w, rx_seg, num_segments=n_seg)
    rx_phase_lo = (
        jax.ops.segment_sum(phase_lo * w, rx_seg, num_segments=n_seg)
        if phase_lo is not None
        else None
    )
    rx_min = jax.ops.segment_min(
        jnp.where(valid, lane, r + 1), rx_seg, num_segments=n_seg
    )

    # Receiver-level lookups via one-hot contraction: XLA lowers many-index
    # gathers from a tiny [num_rx+1] operand pathologically.
    oh_rx = (rx_seg[:, None] == jnp.arange(n_seg, dtype=jnp.int32)[None, :]).astype(fdtype)

    direct = valid & (refl_depth == 0) & (refr_depth == 0)
    npath = jnp.where(direct, oh_rx @ rx_n, grp_n)
    v_sum = jnp.where(direct, oh_rx @ rx_volt, grp_volt)
    d_sum = jnp.where(direct, oh_rx @ rx_delay, grp_delay)
    p_sum = jnp.where(direct, oh_rx @ rx_phase, grp_phase)
    f_sum = jnp.where(direct, oh_rx @ rx_dopp, grp_dopp)
    match = jnp.where(direct, (oh_rx @ rx_min.astype(fdtype)).astype(rx_min.dtype), grp_min)
    match = jnp.where(valid, match, r + 1)

    nz = npath > 0
    safe_n = jnp.where(nz, npath, 1.0)
    agg_power = jnp.where(nz, (v_sum / safe_n) ** 2, power)
    agg_delay = jnp.where(nz, d_sum / safe_n, d_sum)
    agg_dopp = jnp.where(nz, f_sum / safe_n, doppler)
    if phase_lo is not None:
        # phase mean in ds so the emitted (hi + lo) keeps replay precision
        from rts_tpu.core import ds as _ds

        p_sum_lo = jnp.where(direct, oh_rx @ rx_phase_lo, grp_phase_lo)
        mean = _ds.div(_ds.DS(p_sum, p_sum_lo), _ds.ds(safe_n))
        agg_phase = jnp.where(nz, mean.hi, p_sum)
        agg_phase_lo = jnp.where(nz, mean.lo, p_sum_lo)
    else:
        agg_phase = jnp.where(nz, p_sum / safe_n, p_sum)
        agg_phase_lo = jnp.zeros_like(agg_phase)

    # ---- unique-path representatives (ray_tracer.cpp:1290-1304)
    emit = (
        jnp.zeros((r + 2,), bool)
        .at[jnp.where(valid, match, r + 1)]
        .set(True, mode="drop")[:r]
    )

    return LaneAggregate(
        npath=npath,
        power=agg_power,
        delay=agg_delay,
        phase=agg_phase,
        doppler=agg_dopp,
        path_match=match,
        emit=emit,
        phase_lo=agg_phase_lo,
    )
