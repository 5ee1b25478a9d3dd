"""Multipath coherent combining — segmented reduction, no host trip.

TPU-native replacement for the O(N^2) all-pairs CUDA kernels of
aggregation.cu:32-97: rays are grouped by (receiver, target-path row) and
voltages/delays/phases/Dopplers are combined per group.

Two equivalent lowerings, chosen statically by the group-key range:

* DENSE (default whenever ``num_targets`` is known and
  num_rx * (NT+1)^D fits a few thousand bins): the group key is a
  perfect radix hash of (rx, path row), and the segmented sums become
  two one-hot matmuls ([lanes, bins] contractions) — no sort, no
  scatter.  A 30k-lane pulse aggregates in ~50 MFLOP of MXU work; the
  previous lexicographic sort alone cost ~6.6 ms/pulse on TPU.
* SORT (fallback for huge target counts / deep paths): one stable
  multi-key sort by (rx, path row) + jax.ops.segment_* — O(N log N).

Semantics preserved exactly in both, including the reference's
asymmetric "direct transmission" rule (aggregation.cu:56): a ray with
zero bounces matches *every* received ray at its receiver, so direct
rays read the receiver-level aggregates instead of their path group's.

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


# Caps for the sort-free dense lowering.  The dense path materialises
# [lanes, bins] one-hot operands, so BOTH dimensions bound the transient:
# _DENSE_BIN_CAP limits the key space and _DENSE_BYTES_CAP the actual
# lanes x bins x itemsize footprint (a 250k-lane 63^3 fan near the bin
# cap would otherwise transiently allocate ~1 GB).  Scenes beyond either
# cap take the sort path instead.
_DENSE_BIN_CAP = 1024
_DENSE_BYTES_CAP = 256 * 1024 * 1024

# Integer lane ids and ds phase residuals ride through the f32 one-hot
# contractions below; TPU's default f32 matmul demotes operands to bf16,
# and even the framework-wide jax_default_matmul_precision pin
# (rts_tpu/__init__.py) can be overridden by a user's
# jax.default_matmul_precision context — so the precision is pinned
# per-call on every precision-critical contraction.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def aggregate_lanes(
    received: jnp.ndarray,  # [R] int32, -1 = not received
    refl_depth: jnp.ndarray,  # [R] int32
    refr_depth: jnp.ndarray,  # [R] int32
    path: jnp.ndarray,  # [D, R] int32 (lanes-last engine layout)
    power: jnp.ndarray,  # [R] post-processed power
    ray_length: jnp.ndarray,  # [R]
    doppler: jnp.ndarray,  # [R] post-processed Doppler frequency
    num_rx: int,
    cspeed,
    carrier,
    ray_length_lo=None,  # [R] ds residual from the replay (engine/replay.py)
    num_targets: int = 0,  # static; enables the dense (sort-free) lowering
    compact_cap: int = 0,  # gather received lanes to a cap block first
) -> LaneAggregate:
    """See module docstring.  ``compact_cap`` > 0 aggregates a compacted
    block of the received lanes (they are typically a few hundred of a
    250k-lane fan, yet every pass below runs over all lanes — measured
    2.6 ms/pulse at the 63³ production bench): received lanes are
    gathered to the front of a cap-sized block (stable, like the replay
    cap — the argsort CSEs with replay_refine's), aggregated there, and
    scattered back onto the exact lane-space passthrough defaults the
    full path produces for non-received lanes.  A lax.cond falls back to
    the full-lane path when more than ``compact_cap`` lanes were
    received, so results are always exact; within-group sums see the
    same values in the same relative order either way (association may
    differ at the f32 rounding level, as with any resharding)."""
    received, refl_depth, refr_depth, path, power, ray_length, doppler = (
        jnp.asarray(a) for a in
        (received, refl_depth, refr_depth, path, power, ray_length, doppler)
    )
    if ray_length_lo is not None:
        ray_length_lo = jnp.asarray(ray_length_lo)
    r = received.shape[0]
    valid = received >= 0
    fdtype = power.dtype
    cap = min(compact_cap, r) if compact_cap else 0
    if cap and cap < r:
        from rts_tpu.engine.compact import received_first_idx, take_lanes

        count = jnp.sum(valid.astype(jnp.int32))
        # O(L) compaction, same selected set as the stable argsort (CSEs
        # with replay_refine's / cpi.post's); filler slots gather
        # received=-1 (excluded from every group) and their write-backs
        # drop (out-of-range scatter), so they can never alias a lane.
        idx = received_first_idx(received, cap)

        def gather(a):
            # lanes are the LAST axis of every leaf (path is [D, R])
            return None if a is None else take_lanes(a, idx)

        def capped(_):
            core = _aggregate_core(
                take_lanes(received, idx, fill=-1), gather(refl_depth), gather(refr_depth),
                gather(path), gather(power), gather(ray_length),
                gather(doppler), num_rx, cspeed, carrier,
                gather(ray_length_lo), num_targets, lane=idx, r_total=r,
            )
            npath, pw, dl, ph, phl, dp, match = core
            zero = jnp.zeros((r,), fdtype)
            return (
                zero.at[idx].set(npath),
                power.at[idx].set(pw),
                (ray_length / cspeed).at[idx].set(dl),
                zero.at[idx].set(ph),
                zero.at[idx].set(phl),
                doppler.at[idx].set(dp),
                jnp.full((r,), r + 1, jnp.int32).at[idx].set(match),
            )

        def full(_):
            return _aggregate_core(
                received, refl_depth, refr_depth, path, power, ray_length,
                doppler, num_rx, cspeed, carrier, ray_length_lo, num_targets,
                lane=jnp.arange(r, dtype=jnp.int32), r_total=r,
            )

        npath, pw, dl, ph, phl, dp, match = jax.lax.cond(count <= cap, capped, full, 0)
    else:
        npath, pw, dl, ph, phl, dp, match = _aggregate_core(
            received, refl_depth, refr_depth, path, power, ray_length,
            doppler, num_rx, cspeed, carrier, ray_length_lo, num_targets,
            lane=jnp.arange(r, dtype=jnp.int32), r_total=r,
        )

    # ---- unique-path representatives (ray_tracer.cpp:1290-1304).
    # A lane is its group's representative iff it IS the group's min
    # matching lane — so the set {match[l] : valid l} equals
    # {l : match[l] == l}, and the (pathological on TPU) R-update
    # scatter .at[match].set(True) reduces to one elementwise compare
    # (measured: the scatter was ~2 ms/pulse of the 2.36 ms aggregation
    # marginal at the 63³ production bench, docs/PERF.md r4c).
    emit = valid & (match == jnp.arange(r, dtype=match.dtype))
    return LaneAggregate(
        npath=npath, power=pw, delay=dl, phase=ph, doppler=dp,
        path_match=match, emit=emit, phase_lo=phl,
    )


def _aggregate_core(
    received, refl_depth, refr_depth, path, power, ray_length, doppler,
    num_rx, cspeed, carrier, ray_length_lo, num_targets,
    *, lane, r_total,
):
    """Aggregation over one lane block.  ``lane`` carries the ORIGINAL
    lane ids (== arange when the block is the full fan); ``r_total`` sets
    the invalid-lane sentinel (r_total + 1) so path_match/emit semantics
    are block-independent.  Returns the lane-space value tuple."""
    r = received.shape[0]
    d = path.shape[0]
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

    if fdtype == jnp.float32 and r_total + 1 >= (1 << 24):
        # lane ids / group counts round-trip through f32 contractions,
        # exact only below 2^24 — shard the fan (rts_tpu.parallel) or
        # trace in float64 past that.
        raise ValueError(
            f"aggregate_lanes: {r_total} lanes exceeds the exact-int range of "
            "the float32 one-hot reductions (2^24); shard the fan or use float64"
        )
    rx_key = jnp.where(valid, received, num_rx).astype(jnp.int32)
    vals = [w, volt * w, delay * w, phase * w, doppler * w]
    if phase_lo is not None:
        vals.append(phase_lo * w)
    vals = jnp.stack(vals, axis=1)  # [R, M]
    lane_or_big = jnp.where(valid, lane, r_total + 1).astype(fdtype)

    radix = num_targets + 1
    n_bins = num_rx * radix**d + 1 if num_targets > 0 else _DENSE_BIN_CAP + 1
    dense_bytes = r * n_bins * jnp.dtype(fdtype).itemsize
    if n_bins <= _DENSE_BIN_CAP and dense_bytes <= _DENSE_BYTES_CAP:
        # ---- DENSE: perfect radix key -> one-hot matmul reductions.
        # path entries are target ids in [-1, NT); +1 maps them to a
        # radix-(NT+1) digit, so (rx, path row) <-> one bin, bijectively.
        gid = rx_key
        # path entries are target ids in [-1, NT) by the engine's
        # construction (tri_target is clipped before recording); the clip
        # is defensive only — note an out-of-range id would alias onto
        # target NT-1 here where the sort path would keep it distinct
        pk = jnp.clip(path, -1, num_targets - 1) + 1
        for k in range(d):
            gid = gid * radix + pk[k]
        gid = jnp.where(valid, gid, n_bins - 1).astype(jnp.int32)
        oh = (gid[:, None] == jnp.arange(n_bins, dtype=jnp.int32)[None, :]).astype(fdtype)
        seg_sums = _mm(oh.T, vals)  # [n_bins, M]  (w = 0 already zeroes invalid lanes)
        lane_sums = _mm(oh, seg_sums)  # [R, M] back to lane space
        grp_n = lane_sums[:, 0]
        grp_volt = lane_sums[:, 1]
        grp_delay = lane_sums[:, 2]
        grp_phase = lane_sums[:, 3]
        grp_dopp = lane_sums[:, 4]
        grp_phase_lo = lane_sums[:, 5] if phase_lo is not None else None
        # min matching lane per bin (lane ids are exact in f32 up to 2^24)
        seg_min = jnp.min(
            jnp.where(oh > 0, lane_or_big[:, None], jnp.asarray(r_total + 1, fdtype)), axis=0
        )
        grp_min = _mm(oh, seg_min).astype(jnp.int32)
    else:
        # ---- SORT fallback: lexicographic sort by (rx, path row);
        # invalid lanes sort last
        keys = [rx_key] + [path[k] for k in range(d)]
        local = jnp.arange(r, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(tuple(keys) + (local, lane), num_keys=d + 1)
        perm = sorted_ops[-2]  # block-local permutation
        s_lane = sorted_ops[-1]  # ORIGINAL lane ids, sorted alongside
        s_keys = sorted_ops[:-2]

        def diff(a):
            return a[1:] != a[:-1]

        boundary = jnp.zeros((r,), bool).at[1:].set(
            jnp.stack([diff(k) for k in s_keys], axis=0).any(axis=0)
        )
        seg = jnp.cumsum(boundary.astype(jnp.int32))

        s_vals = vals[perm]
        g_sums = jnp.stack(
            [
                jax.ops.segment_sum(s_vals[:, m], seg, num_segments=r)
                for m in range(vals.shape[1])
            ],
            axis=1,
        )
        g_min = jax.ops.segment_min(
            jnp.where(valid[perm], s_lane, r_total + 1), seg, num_segments=r
        )

        # back to lane order
        inv = jnp.zeros((r,), jnp.int32).at[perm].set(jnp.arange(r, dtype=jnp.int32))
        lane_seg = seg[inv]
        lane_sums = g_sums[lane_seg]
        grp_n = lane_sums[:, 0]
        grp_volt = lane_sums[:, 1]
        grp_delay = lane_sums[:, 2]
        grp_phase = lane_sums[:, 3]
        grp_dopp = lane_sums[:, 4]
        grp_phase_lo = lane_sums[:, 5] if phase_lo is not None else None
        grp_min = g_min[lane_seg]

    # ---- receiver-level aggregates (for the direct-transmission rule),
    # via one-hot contraction: num_rx+1 bins are always tiny, and XLA
    # lowers both scatters and tiny-operand gathers pathologically on TPU
    n_seg = num_rx + 1
    oh_rx = (rx_key[:, None] == jnp.arange(n_seg, dtype=jnp.int32)[None, :]).astype(fdtype)
    rx_sums = _mm(oh_rx.T, vals)  # [n_seg, M]
    rx_lane = _mm(oh_rx, rx_sums)  # [R, M]
    rx_min_seg = jnp.min(
        jnp.where(oh_rx > 0, lane_or_big[:, None], jnp.asarray(r_total + 1, fdtype)), axis=0
    )
    rx_min_lane = _mm(oh_rx, rx_min_seg).astype(jnp.int32)

    direct = valid & (refl_depth == 0) & (refr_depth == 0)
    npath = jnp.where(direct, rx_lane[:, 0], grp_n)
    v_sum = jnp.where(direct, rx_lane[:, 1], grp_volt)
    d_sum = jnp.where(direct, rx_lane[:, 2], grp_delay)
    p_sum = jnp.where(direct, rx_lane[:, 3], grp_phase)
    f_sum = jnp.where(direct, rx_lane[:, 4], grp_dopp)
    match = jnp.where(direct, rx_min_lane, grp_min)
    match = jnp.where(valid, match, r_total + 1)

    # npath == 0 is possible only for invalid (never-emitted) lanes —
    # every valid lane contributes w=1 to its own group — so the
    # fallbacks are defensive; keep them uniformly "lane's own input".
    nz = npath > 0
    safe_n = jnp.where(nz, npath, 1.0)
    agg_power = jnp.where(nz, (v_sum / safe_n) ** 2, power)
    agg_delay = jnp.where(nz, d_sum / safe_n, delay)
    agg_dopp = jnp.where(nz, f_sum / safe_n, doppler)
    if phase_lo is not None:
        # phase mean in ds so the emitted (hi + lo) keeps replay precision
        from rts_tpu.core import ds as _ds

        p_sum_lo = jnp.where(direct, rx_lane[:, 5], grp_phase_lo)
        mean = _ds.div(_ds.DS(p_sum, p_sum_lo), _ds.ds(safe_n))
        agg_phase = jnp.where(nz, mean.hi, p_sum)
        agg_phase_lo = jnp.where(nz, mean.lo, p_sum_lo)
    else:
        agg_phase = jnp.where(nz, p_sum / safe_n, p_sum)
        agg_phase_lo = jnp.zeros_like(agg_phase)

    return npath, agg_power, agg_delay, agg_phase, agg_phase_lo, agg_dopp, match
