"""Simulation driver — the ``rs::RTS`` equivalent (ray_tracer.cpp:509-1363).

Orchestrates the full per-run flow: for each transmitter, for each pulse,
rebuild the moving scene, trace the ray fan on device, post-process
(RCS / antenna gains / relativistic Doppler), coherently combine multipath
returns, and attach one ``Response`` per unique propagation path to its
receiver (ray_tracer.cpp:1290-1321).

TPU-first structure: the host loop only prepares NumPy scene arrays and
collects results; everything between the jit boundaries — trace,
post-process, aggregation — is vectorised JAX with static shapes.

Reference quirks preserved:
  * Receiver noise temperature is *accumulated* per transmitter loop:
    ``SetNoiseTemperature(wave.GetTemp() + GetNoiseTemperature())``
    (ray_tracer.cpp:829).
  * A rotating target's time-varying attitude is applied ON TOP of its
    t=0 attitude (composite R(t)·R(0)), and only when ``t > start_time``
    (ray_tracer.cpp:993-1007); the t=0 angles are float-narrowed, the
    time-varying ones are double.
  * ``InterpPoint`` takes the path-group AGGREGATED power, Doppler,
    delay and phase: aggregation kernel 2 writes the combined power and
    Doppler back into ``d_results_arr`` (aggregation.cu:89-93), which is
    copied into ``h_rx_results_arr`` (aggregation.cu:169) before the
    InterpPoint loop reads it (ray_tracer.cpp:1310-1316) — so "Power and
    Doppler from hbuf_results" are the aggregated values too.
  * Target velocity is finite-differenced over one CW sample
    (ray_tracer.cpp:941-948).
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import List

import jax.numpy as jnp
import numpy as np

from rts_tpu.aggregate import aggregate_lanes
from rts_tpu.config import Parameters
from rts_tpu.core.rotation import vertex_rotation
from rts_tpu.engine import RxGeomDevice, TraceConfig, scene_to_device, trace_pulse
from rts_tpu.geometry.mesh import Mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.physics.postprocess import postprocess
from rts_tpu.physics.receiver_geom import rx_sphere_geometry
from rts_tpu.sim.response import InterpPoint, Response
from rts_tpu.sim.waveform import TransmitterPulse
from rts_tpu.sim.world import World


@dataclasses.dataclass
class PulseStats:
    transmitter: str
    pulse: int
    time: float
    received_rays: int
    responses: int
    trace_seconds: float


@dataclasses.dataclass
class RunSummary:
    pulses: List[PulseStats] = dataclasses.field(default_factory=list)

    @property
    def total_responses(self) -> int:
        return sum(p.responses for p in self.pulses)

    @property
    def total_received(self) -> int:
        return sum(p.received_rays for p in self.pulses)


def _target_mesh_at(target, time_t: float, start_time: float, *, strict_parity: bool) -> Mesh:
    """Target mesh in world frame at pulse time (ray_tracer.cpp:956-1014
    minus the final translation, which the caller applies)."""
    mesh = target.base_mesh(strict_parity=strict_parity)
    if target.attitude.is_rotating and time_t > start_time:
        yaw, pitch, roll = target.attitude.ypr(time_t)
        verts = vertex_rotation(mesh.verts, yaw, pitch, roll, strict_parity=False)
        normals = vertex_rotation(mesh.normals, yaw, pitch, roll, strict_parity=False)
        mesh = Mesh(verts, mesh.tris, normals)
    return mesh


def run(
    world: World,
    params: Parameters,
    *,
    dtype=jnp.float64,
    strict_parity: bool = False,
    tri_chunk: int = 512,
    pad_tris_to: int = 1,
    accel: str = "brute",
    cluster_size: int = 256,
    interpret: bool = False,
    verbose: bool = False,
    **trace_options,
) -> RunSummary:
    """Run the full simulation, mutating receiver response lists.

    The analogue of calling ``rs::RTS(world, MaxThreads, MaxBlocks)``;
    grid-shape knobs are replaced by the engine's ``tri_chunk`` tile size.
    Extra keyword options pass through to :class:`TraceConfig` (e.g.
    ``ray_tile``, ``compact_narrow``).
    """
    cfg = TraceConfig.from_parameters(
        params, strict_parity=strict_parity, tri_chunk=tri_chunk,
        accel=accel, cluster_size=cluster_size, interpret=interpret,
        **trace_options,
    )
    cspeed = params.c
    num_rx = len(world.receivers)
    summary = RunSummary()

    for trans in world.transmitters:
        signal = TransmitterPulse()
        trans.GetPulse(signal, 0)
        wave = signal.wave
        carrier = wave.GetCarrier()
        tx_span = tuple(float(x) for x in trans.GetTxSpan())

        # Accumulating noise-temperature quirk (ray_tracer.cpp:829).
        for rx in world.receivers:
            rx.SetNoiseTemperature(wave.GetTemp() + rx.GetNoiseTemperature())

        for k in range(trans.GetPulseCount()):
            trans.GetPulse(signal, k)
            time_t = float(signal.time)

            tx_origin = np.asarray(trans.GetPosition(time_t), dtype=np.float64).reshape(3)
            tx_az, tx_el = (float(a) for a in trans.GetRotation(time_t))

            # Receiver spheres + acceptance windows (ray_tracer.cpp:894-925).
            rx_pos = np.array(
                [np.asarray(rx.GetPosition(time_t), np.float64).reshape(3) for rx in world.receivers]
            ).reshape(num_rx, 3)
            rx_rot = [tuple(float(a) for a in rx.GetRotation(time_t)) for rx in world.receivers]
            spheres = np.array([rx.GetRxSphere() for rx in world.receivers], np.float64).reshape(num_rx, 3)
            rx_geom = rx_sphere_geometry(
                rx_pos,
                np.array([r[0] for r in rx_rot]),
                np.array([r[1] for r in rx_rot]),
                spheres[:, 0],
                spheres[:, 1],
                spheres[:, 2],
                strict_parity=True,
            )

            # Per-pulse scene rebuild (ray_tracer.cpp:936-1146).
            meshes, velocities = [], []
            for targ in world.targets:
                pos = np.asarray(targ.GetPosition(time_t), np.float64).reshape(3)
                pos_end = np.asarray(
                    targ.GetPosition(time_t + params.sample_time), np.float64
                ).reshape(3)
                velocities.append((pos_end - pos) / params.sample_time)
                mesh = _target_mesh_at(targ, time_t, params.start_time, strict_parity=strict_parity)
                meshes.append(mesh.translated(pos))
            scene = compile_scene(
                meshes,
                [t.GetReflCoeff() for t in world.targets],
                [t.GetRefrIndex() for t in world.targets],
                velocities,
                pad_to=pad_tris_to,
            )
            if accel == "cluster":
                from rts_tpu.accel import cluster_reorder

                scene = cluster_reorder(scene, cluster_size=cluster_size)

            t0 = _time.perf_counter()
            res = trace_pulse(
                scene_to_device(scene, dtype=dtype),
                RxGeomDevice.from_host(rx_geom, dtype=dtype),
                jnp.asarray(tx_origin, dtype),
                (tx_az, tx_el),
                tx_span,
                cfg,
            )

            power, doppler, _delay = postprocess(
                res,
                tx_origin=jnp.asarray(tx_origin, dtype),
                rx_positions=jnp.asarray(rx_pos, dtype),
                rcs_models=[t.rcs_model for t in world.targets],
                tx_gain=trans.antenna,
                rx_gains=[rx.antenna for rx in world.receivers],
                tx_rotation=(tx_az, tx_el),
                rx_rotation_fns=[rx.rotation.azel for rx in world.receivers],
                time_t=time_t,
                carrier=carrier,
                cspeed=cspeed,
            )

            lane = aggregate_lanes(
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
                num_targets=len(world.targets),
                compact_cap=cfg.agg_cap,
            )
            trace_s = _time.perf_counter() - t0

            # Hand-off: one Response per unique path (ray_tracer.cpp:1290-1321).
            emit_idx = np.flatnonzero(np.asarray(lane.emit))
            h_received = np.asarray(res.received)
            h_power = np.asarray(lane.power)
            h_doppler = np.asarray(lane.doppler)
            h_delay = np.asarray(lane.delay)
            h_phase = np.asarray(lane.phase, np.float64) + np.asarray(lane.phase_lo, np.float64)
            n_resp = 0
            for i in emit_idx:
                rx = world.receivers[int(h_received[i])]
                point = InterpPoint(
                    power=float(h_power[i]),
                    time=time_t + float(h_delay[i]),
                    delay=float(h_delay[i]),
                    doppler=float(h_doppler[i]),
                    phase=float(h_phase[i]),
                    noise_temperature=rx.GetNoiseTemperature(),
                )
                response = Response(wave, trans)
                response.AddInterpPoint(point)
                rx.AddResponse(response)
                n_resp += 1

            received_rays = int(np.sum(h_received >= 0))
            if verbose:
                print(
                    f"[{trans.name} pulse {k}] rays received: {received_rays}, "
                    f"responses: {n_resp}, trace {trace_s:.3f}s"
                )
            summary.pulses.append(
                PulseStats(
                    transmitter=trans.name,
                    pulse=k,
                    time=time_t,
                    received_rays=received_rays,
                    responses=n_resp,
                    trace_seconds=trace_s,
                )
            )

    return summary
