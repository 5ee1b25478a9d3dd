"""ICI sharding of the CPI trace: pulse axis x ray axis over a device mesh.

The reference is single-GPU — pulses run in a strictly sequential host
loop (ray_tracer.cpp:843) and rays fill one launch grid.  The TPU-native
scaling design (SURVEY.md §2.2) makes both first-class mesh axes:

  * ``pulse`` — embarrassingly parallel data axis: each device traces a
    contiguous block of the CPI's pulses (BASELINE config 5).
  * ``ray``   — the N^3 launch fan is split into contiguous blocks; each
    device traces its block through all bounces, then per-receiver
    multipath aggregation needs every lane of the pulse, so lane summaries
    ride ICI via ``all_gather`` over the ray axis before the sort/segment
    combine.  (The trace itself needs no communication — only the
    aggregation boundary does.)

Lane layout: a fan block of F rays produces ``slot_multiplier * F`` lanes
ordered slot-major (slot*F + f).  The global pulse layout interleaves fan
blocks per slot — ``slot*N^3 + shard*F + f`` — restored after the gather
by a reshape/transpose, making sharded results BIT-IDENTICAL to
single-chip runs (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rts_tpu.engine.animate import SceneBase
from rts_tpu.engine.cpi import CpiResult, CpiSpec, PulseBatch, make_pulse_fn, map_pulses
from rts_tpu.engine.types import TraceConfig


def make_mesh(pulse_shards: int, ray_shards: int = 1, devices=None) -> Mesh:
    """A ("pulse", "ray") device mesh; defaults to all available devices."""
    if devices is None:
        devices = jax.devices()
    n = pulse_shards * ray_shards
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(pulse_shards, ray_shards)
    return Mesh(dev, axis_names=("pulse", "ray"))


def shard_batch(batch: PulseBatch, mesh: Mesh) -> PulseBatch:
    """Place the pulse batch: leading pulse axis sharded, rest replicated."""
    sharding = NamedSharding(mesh, P("pulse"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def _regather_lanes(x, slot_mult: int, f_local: int):
    """all_gather fan shards and restore the global slot-major layout.

    Lanes are the LAST axis of every leaf (engine layout).  Local lanes
    are ordered ``slot*F + f``; gathering k shards gives shard-major
    ``k*(slot_mult*F) + slot*F + f`` — transpose to the global
    ``slot*(k*F) + k*F_block + f`` order (ray_tracer.cpp:626 layout).
    """
    ax = x.ndim - 1
    g = jax.lax.all_gather(x, "ray", axis=ax, tiled=False)  # [..., k, slot_mult*F]
    k = g.shape[ax]
    head = g.shape[:ax]
    g = g.reshape(head + (k, slot_mult, f_local))
    g = jnp.swapaxes(g, ax, ax + 1)
    return g.reshape(head + (slot_mult * k * f_local,))


@partial(jax.jit, static_argnames=("cfg", "spec", "mesh"))
def _trace_cpi_shmap(base: SceneBase, batch: PulseBatch, cfg: TraceConfig, spec: CpiSpec, mesh: Mesh):
    ray_shards = mesh.shape["ray"]
    if cfg.rays_per_fan % ray_shards:
        raise ValueError(f"N^3={cfg.rays_per_fan} not divisible by ray shards {ray_shards}")
    f_local = cfg.rays_per_fan // ray_shards

    one_pulse, aggregate = make_pulse_fn(
        base,
        cfg,
        **spec.kwargs(),
        fan_slice=(ray_shards, lambda: jax.lax.axis_index("ray")),
    )

    def per_pulse(rot, pos, vel, rxg, rxp, txo, txd, t, refine=None):
        res, power, doppler, delay = one_pulse(rot, pos, vel, rxg, rxp, txo, txd, t, refine)
        # Reassemble full-pulse lanes across the ray axis for aggregation.
        regather = partial(_regather_lanes, slot_mult=cfg.slot_multiplier, f_local=f_local)
        res = jax.tree.map(regather, res)
        power, doppler, delay = regather(power), regather(doppler), regather(delay)
        return aggregate(res, power, doppler, delay)

    def block(rot, pos, vel, rxg, rxp, txo, txd, t, refine=None):
        local = PulseBatch(rot, pos, vel, rxg, rxp, txo, txd, t, refine)
        return map_pulses(per_pulse, local, cfg)

    in_spec = P("pulse")
    shmapped = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(in_spec,) * 9,
        out_specs=P("pulse"),
        check_vma=False,
    )
    return shmapped(
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


def trace_cpi_sharded(
    base: SceneBase,
    batch: PulseBatch,
    cfg: TraceConfig,
    spec: CpiSpec,
    mesh: Mesh,
) -> CpiResult:
    """Trace a CPI sharded over (pulse, ray) mesh axes.

    Results are bit-identical to the single-device `trace_cpi` — the ray
    split changes only WHERE lanes are traced, not their math, and
    aggregation always sees the full reassembled pulse.
    """
    p = batch.times.shape[0]
    pulse_shards = mesh.shape["pulse"]
    if p % pulse_shards:
        raise ValueError(f"pulse count {p} not divisible by pulse shards {pulse_shards}")
    return _trace_cpi_shmap(base, batch, cfg, spec, mesh)
