"""Batched CPI tracing: vmap over the pulse axis, all inside one jit.

The reference traces a CPI as a strictly sequential host loop with a BVH
rebuild and dozens of host<->device buffer round-trips per pulse
(ray_tracer.cpp:843-1333).  Here a whole CPI is ONE traced computation:
per-pulse rigid scene transforms, tracing, post-processing and multipath
aggregation all batch over a leading pulse axis, leaving XLA free to fuse
and overlap across pulses.  The pulse axis is also the unit of ICI
sharding (rts_tpu.parallel).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rts_tpu.aggregate import LaneAggregate, aggregate_lanes
from rts_tpu.engine.animate import SceneBase, animate_packed, animate_scene
from rts_tpu.engine.fan import generate_fan_c
from rts_tpu.engine.types import RxGeomDevice, TraceConfig
from rts_tpu.engine.wavefront import trace_fan
from rts_tpu.physics.postprocess import postprocess


class CpiResult(NamedTuple):
    """Per-pulse, per-lane outputs ([P, R] unless noted).

    ``power``/``doppler`` are the post-processed per-ray values that feed
    responses; ``agg`` holds the path-group combined quantities and the
    ``emit`` representative mask (ray_tracer.cpp:1290-1321 semantics).
    """

    power: jnp.ndarray
    doppler: jnp.ndarray
    delay: jnp.ndarray
    received: jnp.ndarray  # int32
    agg: LaneAggregate


class PulseBatch(NamedTuple):
    """Per-pulse dynamic inputs (leading axis P)."""

    rot: jnp.ndarray  # [P, NT, 3, 3] extra attitude rotations
    pos: jnp.ndarray  # [P, NT, 3] target centres
    vel: jnp.ndarray  # [P, NT, 3] target velocities
    rx_geom: RxGeomDevice  # leaves [P, NR, ...]
    rx_pos: jnp.ndarray  # [P, NR, 3] receiver positions
    tx_origin: jnp.ndarray  # [P, 3]
    tx_dir: jnp.ndarray  # [P, 2] boresight (azimuth, elevation)
    times: jnp.ndarray  # [P] pulse start times
    refine: object = None  # RefineExtras (leaves [P, ...]) when cfg.refine


def make_pulse_fn(
    base: SceneBase,
    cfg: TraceConfig,
    *,
    tx_span,
    rcs_models,
    tx_gain,
    rx_gains,
    rx_rotation_fns,
    carrier,
    cspeed,
    num_rx: int,
    fan_slice=None,  # (num_shards, shard_index fn) — set by the sharded path
):
    """Build the single-pulse trace→postprocess→aggregate closure.

    Static scene topology and physics models are closed over; everything
    per-pulse arrives as traced arrays so the closure can be vmapped
    (CPI batching) or shard_mapped (ICI).
    """

    def one_pulse(rot, pos, vel, rx_geom: RxGeomDevice, rx_pos, tx_origin, tx_dir, time_t, refine=None):
        dtype = base.tri_verts.dtype
        if cfg.accel == "cluster":
            scene = animate_packed(
                base, rot, pos, vel, cfg.cluster_size,
                shade_rows=cfg.shade_emit and cfg.interpolate_smooth,
            )
        else:
            scene = animate_scene(base, rot, pos, vel)
        fan = generate_fan_c(cfg.num_rays, (tx_dir[0], tx_dir[1]), tx_span, dtype=dtype)
        block = cfg.rays_per_fan
        offset = jnp.int32(0)
        if fan_slice is not None:
            n_shards, index = fan_slice
            block = cfg.rays_per_fan // n_shards
            offset = (index() * block).astype(jnp.int32)
            fan = jax.lax.dynamic_slice_in_dim(fan, offset, block, axis=1)
        res = trace_fan(scene, rx_geom, tx_origin, fan, cfg)
        if cfg.refine:
            from rts_tpu.engine.replay import replay_refine

            res = replay_refine(
                base, res, cfg, refine,
                rot=rot, pos=pos, vel=vel, rx_geom=rx_geom,
                tx_origin=tx_origin, tx_span=tx_span,
                fan_block=block, fan_offset=offset,
            )

        def post(sub):
            return postprocess(
                sub,
                tx_origin=tx_origin,
                rx_positions=rx_pos,
                rcs_models=rcs_models,
                tx_gain=tx_gain,
                rx_gains=rx_gains,
                tx_rotation=(tx_dir[0], tx_dir[1]),
                rx_rotation_fns=rx_rotation_fns,
                time_t=time_t,
                carrier=carrier,
                cspeed=cspeed,
            )

        total = res.received.shape[0]
        cap = min(cfg.agg_cap, total) if cfg.agg_cap else 0
        if cap and cap < total:
            # Postprocess is purely per-lane and only changes RECEIVED
            # lanes (valid-gated), yet gains/RCS/atan2 ran over the full
            # fan (~250k lanes for typically a few thousand received) —
            # gather the received lanes to a cap block (the O(L) cumsum
            # compaction CSEs with replay_refine's and aggregate_lanes'),
            # postprocess there, scatter back onto the exact passthrough
            # defaults the full path produces for non-received lanes
            # (filler slots are out-of-range: gathers fill received=-1,
            # write-backs drop).  BIT-identical per lane; a lax.cond
            # falls back to the full pass when more than cap lanes were
            # received.
            from rts_tpu.engine.compact import received_first_idx, take_lanes

            count = jnp.sum((res.received >= 0).astype(jnp.int32))
            idx = received_first_idx(res.received, cap)

            def capped(_):
                sub = jax.tree.map(lambda a: take_lanes(a, idx), res)
                sub = sub._replace(received=take_lanes(res.received, idx, fill=-1))
                pw_c, dp_c, _dl_c = post(sub)
                return (
                    res.power.at[idx].set(pw_c),
                    res.doppler.at[idx].set(dp_c),
                )

            def full(_):
                pw_f, dp_f, _dl_f = post(res)
                return pw_f, dp_f

            power, doppler = jax.lax.cond(count <= cap, capped, full, 0)
            delay = res.ray_length / cspeed
        else:
            power, doppler, delay = post(res)
        return res, power, doppler, delay

    def aggregate(res, power, doppler, delay):
        agg = aggregate_lanes(
            res.received,
            res.refl_depth,
            res.refr_depth,
            res.path,
            power,
            res.ray_length,
            doppler,
            num_rx=num_rx,
            cspeed=cspeed,
            carrier=carrier,
            ray_length_lo=res.ray_length_lo if cfg.refine else None,
            num_targets=int(base.target_refl.shape[0]),
            compact_cap=cfg.agg_cap,
        )
        return CpiResult(power=power, doppler=doppler, delay=delay, received=res.received, agg=agg)

    return one_pulse, aggregate


def map_pulses(full, batch: PulseBatch, cfg: TraceConfig):
    """Batch ``full`` over the pulse axis.

    vmap for the dense path; lax.map (sequential per device) for the
    clustered path — a Pallas call with HBM operands cannot be batch-
    sliced by vmap, and per-pulse sequencing costs nothing when each
    pulse already fills the chip via the kernel's ray-tile grid.
    """
    args = (
        batch.rot,
        batch.pos,
        batch.vel,
        batch.rx_geom,
        batch.rx_pos,
        batch.tx_origin,
        batch.tx_dir,
        batch.times,
        batch.refine,
    )
    if cfg.accel == "cluster":
        return jax.lax.map(lambda xs: full(*xs), args)
    return jax.vmap(full)(*args)


@partial(jax.jit, static_argnames=("cfg", "spec"))
def _trace_cpi_jit(base, batch, cfg, spec):
    one_pulse, aggregate = make_pulse_fn(base, cfg, **spec.kwargs())

    def full(rot, pos, vel, rxg, rxp, txo, txd, t, refine=None):
        return aggregate(*one_pulse(rot, pos, vel, rxg, rxp, txo, txd, t, refine))

    return map_pulses(full, batch, cfg)


class CpiSpec:
    """Hashable carrier for the static closure parameters of a CPI trace.

    Physics model objects (antennas, RCS) are compared by identity — reuse
    the same spec across calls to hit the jit cache.
    """

    def __init__(self, *, tx_span, rcs_models, tx_gain, rx_gains, rx_rotation_fns, carrier, cspeed, num_rx):
        self._kw = dict(
            tx_span=tuple(float(x) for x in tx_span),
            rcs_models=tuple(rcs_models),
            tx_gain=tx_gain,
            rx_gains=tuple(rx_gains),
            rx_rotation_fns=tuple(rx_rotation_fns),
            carrier=float(carrier),
            cspeed=float(cspeed),
            num_rx=int(num_rx),
        )

    def kwargs(self):
        return dict(self._kw)

    def __hash__(self):
        return hash(
            (
                self._kw["tx_span"],
                tuple(id(m) for m in self._kw["rcs_models"]),
                id(self._kw["tx_gain"]),
                tuple(id(g) for g in self._kw["rx_gains"]),
                tuple(id(f) for f in self._kw["rx_rotation_fns"]),
                self._kw["carrier"],
                self._kw["cspeed"],
                self._kw["num_rx"],
            )
        )

    def __eq__(self, other):
        return isinstance(other, CpiSpec) and hash(self) == hash(other)


def trace_cpi(base: SceneBase, batch: PulseBatch, cfg: TraceConfig, spec: CpiSpec) -> CpiResult:
    """Trace a whole CPI in one jit call (single device)."""
    return _trace_cpi_jit(base, batch, cfg, spec)
