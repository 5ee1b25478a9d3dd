"""CPI-level simulation front-end: World -> batched device arrays -> run.

Builds the static ``SceneBase`` once and a ``PulseBatch`` of per-pulse
transforms/geometry, then traces the whole CPI in one jit call
(`rts_tpu.engine.cpi.trace_cpi`) or sharded over an ICI mesh
(`rts_tpu.parallel`).  This is the high-throughput path; `rts_tpu.sim.run`
remains the reference-shaped sequential driver.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rts_tpu.config import Parameters
from rts_tpu.engine import RxGeomDevice, TraceConfig
from rts_tpu.engine.animate import SceneBase, attitude_rotations, scene_base, target_motion
from rts_tpu.engine.cpi import CpiResult, CpiSpec, PulseBatch, trace_cpi
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.physics.receiver_geom import rx_sphere_geometry
from rts_tpu.sim.response import InterpPoint, Response
from rts_tpu.sim.waveform import TransmitterPulse
from rts_tpu.sim.world import World


def prepare_cpi(
    world: World,
    params: Parameters,
    *,
    tx_index: int = 0,
    dtype=jnp.float32,
    strict_parity: bool = False,
    tri_chunk: int = 512,
    pad_tris_to: int = 1,
    accel: str = "brute",
    cluster_size: int = 256,
    ray_tile: int = 256,
    candidates: int = 64,
    sub_tiles: int = 4,
    fan_order: str = "raster",
    interpret: bool = False,
    refine: bool = False,
    replay_cap: int = 0,
):
    """Compile (base scene, pulse batch, cfg, spec) for one transmitter's CPI.

    ``refine=True`` additionally ships the double-single residuals and
    per-pulse fan rotations the extended-precision replay needs
    (engine/replay.py), so the f32 engine meets the reference's
    double-precision 1e-6 power/phase contract."""
    trans = world.transmitters[tx_index]
    signal = TransmitterPulse()
    trans.GetPulse(signal, 0)
    wave = signal.wave
    carrier = wave.GetCarrier()
    num_rx = len(world.receivers)
    pulse_count = trans.GetPulseCount()
    times = np.array([trans.pulse_time(k) for k in range(pulse_count)], np.float64)

    # static scene (t=0 attitude, origin-centred)
    meshes = [t.base_mesh(strict_parity=strict_parity) for t in world.targets]
    scene = compile_scene(
        meshes,
        [t.GetReflCoeff() for t in world.targets],
        [t.GetRefrIndex() for t in world.targets],
        pad_to=pad_tris_to,
    )
    if accel == "cluster":
        from rts_tpu.accel import cluster_reorder

        scene = cluster_reorder(scene, cluster_size=cluster_size)
    base = scene_base(
        scene,
        dtype=dtype,
        with_lo=refine,
        cluster_size=cluster_size if accel == "cluster" else 0,
    )

    # per-pulse transforms
    rot = attitude_rotations(world.targets, times, params.start_time)
    pos, vel = target_motion(world.targets, times, params.sample_time)

    # per-pulse tx/rx geometry — fully vectorised over the pulse axis
    # (paths/rotations evaluate on time ARRAYS; no per-pulse Python loop,
    # so a 4096-pulse CPI preps in milliseconds)
    txo = np.asarray(trans.GetPosition(times), np.float64).reshape(pulse_count, 3)
    tx_az, tx_el = trans.GetRotation(times)
    txd = np.stack([np.broadcast_to(tx_az, times.shape), np.broadcast_to(tx_el, times.shape)], axis=-1).astype(np.float64)
    spheres = np.array([rx.GetRxSphere() for rx in world.receivers], np.float64).reshape(num_rx, 3)
    if num_rx:
        rx_pos = np.stack(
            [np.asarray(rx.GetPosition(times), np.float64).reshape(pulse_count, 3) for rx in world.receivers],
            axis=1,
        )  # [P, NR, 3]
        rx_az = np.stack(
            [np.broadcast_to(rx.GetRotation(times)[0], times.shape) for rx in world.receivers], axis=1
        ).astype(np.float64)
        rx_el = np.stack(
            [np.broadcast_to(rx.GetRotation(times)[1], times.shape) for rx in world.receivers], axis=1
        ).astype(np.float64)
        g = rx_sphere_geometry(
            rx_pos.reshape(-1, 3),
            rx_az.reshape(-1),
            rx_el.reshape(-1),
            np.tile(spheres[:, 0], pulse_count),
            np.tile(spheres[:, 1], pulse_count),
            np.tile(spheres[:, 2], pulse_count),
            strict_parity=True,
        )
        geo = {
            "centre": g.centre.reshape(pulse_count, num_rx, 3),
            "radius": g.radius.reshape(pulse_count, num_rx),
            "min_theta": g.min_theta.reshape(pulse_count, num_rx),
            "max_theta": g.max_theta.reshape(pulse_count, num_rx),
            "min_phi": g.min_phi.reshape(pulse_count, num_rx),
            "max_phi": g.max_phi.reshape(pulse_count, num_rx),
        }
    else:
        rx_pos = np.zeros((pulse_count, 0, 3))
        geo = {
            "centre": np.zeros((pulse_count, 0, 3)),
            "radius": np.zeros((pulse_count, 0)),
            "min_theta": np.zeros((pulse_count, 0)),
            "max_theta": np.zeros((pulse_count, 0)),
            "min_phi": np.zeros((pulse_count, 0)),
            "max_phi": np.zeros((pulse_count, 0)),
        }

    rx_geom = RxGeomDevice(
        centre=jnp.asarray(geo["centre"], dtype),
        radius=jnp.asarray(geo["radius"], dtype),
        min_theta=jnp.asarray(geo["min_theta"], dtype),
        max_theta=jnp.asarray(geo["max_theta"], dtype),
        min_phi=jnp.asarray(geo["min_phi"], dtype),
        max_phi=jnp.asarray(geo["max_phi"], dtype),
    )

    extras = None
    if refine:
        if dtype != jnp.float32:
            raise ValueError("refine=True targets the f32 engine (lo residuals are f64-f32)")
        from rts_tpu.core.rotation import rot_axis_reversed, rot_z
        from rts_tpu.engine.replay import RefineExtras

        def lo32(a):
            a = np.asarray(a, np.float64)
            return jnp.asarray((a - a.astype(np.float32).astype(np.float64)).astype(np.float32))

        # per-pulse fan rotation r1 @ rz in f64 (mirrors engine/fan.py)
        fan_rot = np.zeros((pulse_count, 3, 3))
        bore = np.zeros((pulse_count, 3))
        for i in range(pulse_count):
            az, el = float(txd[i, 0]), float(txd[i, 1])
            rz = rot_z(np.float64(az), xp=np)
            orth = rz[:, 1] / np.linalg.norm(rz[:, 1])
            r1 = rot_axis_reversed(orth, np.float64(el), xp=np)
            fan_rot[i] = r1 @ rz
            bore[i] = [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
        rx_c = np.asarray(geo["centre"], np.float64)
        rx_r = np.asarray(geo["radius"], np.float64)
        extras = RefineExtras(
            rot_lo=lo32(rot),
            pos_lo=lo32(pos),
            vel_lo=lo32(vel),
            txo_lo=lo32(txo),
            rxc_lo=lo32(rx_c),
            rxr_lo=lo32(rx_r),
            fan_rot_hi=jnp.asarray(fan_rot.astype(np.float32)),
            fan_rot_lo=lo32(fan_rot),
            bore_hi=jnp.asarray(bore.astype(np.float32)),
            bore_lo=lo32(bore),
        )

    batch = PulseBatch(
        rot=jnp.asarray(rot, dtype),
        pos=jnp.asarray(pos, dtype),
        vel=jnp.asarray(vel, dtype),
        rx_geom=rx_geom,
        rx_pos=jnp.asarray(rx_pos, dtype),
        tx_origin=jnp.asarray(txo, dtype),
        tx_dir=jnp.asarray(txd, dtype),
        times=jnp.asarray(times, dtype),
        refine=extras,
    )

    cfg = TraceConfig.from_parameters(
        params,
        strict_parity=strict_parity,
        tri_chunk=tri_chunk,
        accel=accel,
        cluster_size=cluster_size,
        ray_tile=ray_tile,
        candidates=candidates,
        sub_tiles=sub_tiles,
        fan_order=fan_order,
        interpret=interpret,
        refine=refine,
        replay_cap=replay_cap,
    )
    spec = CpiSpec(
        tx_span=trans.GetTxSpan(),
        rcs_models=[t.rcs_model for t in world.targets],
        tx_gain=trans.antenna,
        rx_gains=[rx.antenna for rx in world.receivers],
        rx_rotation_fns=[rx.rotation.azel for rx in world.receivers],
        carrier=carrier,
        cspeed=params.c,
        num_rx=num_rx,
    )
    return base, batch, cfg, spec


def run_all_cpi(world: World, params: Parameters, **kw) -> list:
    """Trace every transmitter's CPI (the outer loop of rs::RTS,
    ray_tracer.cpp:806); returns one CpiResult per transmitter."""
    return [
        run_cpi(world, params, tx_index=i, **kw)
        for i in range(len(world.transmitters))
    ]


def run_cpi(
    world: World,
    params: Parameters,
    *,
    tx_index: int = 0,
    dtype=jnp.float32,
    strict_parity: bool = False,
    tri_chunk: int = 512,
    accel: str = "brute",
    cluster_size: int = 1024,
    ray_tile: int = 256,
    interpret: bool = False,
    refine: bool = False,
    attach_responses: bool = True,
) -> CpiResult:
    """Trace one transmitter's whole CPI in a single jit call, then
    (optionally) attach Responses exactly like the sequential driver."""
    base, batch, cfg, spec = prepare_cpi(
        world,
        params,
        tx_index=tx_index,
        dtype=dtype,
        strict_parity=strict_parity,
        tri_chunk=tri_chunk,
        accel=accel,
        cluster_size=cluster_size,
        ray_tile=ray_tile,
        interpret=interpret,
        refine=refine,
    )
    out = trace_cpi(base, batch, cfg, spec)

    if attach_responses:
        trans = world.transmitters[tx_index]
        signal = TransmitterPulse()
        trans.GetPulse(signal, 0)
        wave = signal.wave
        for rx in world.receivers:
            rx.SetNoiseTemperature(wave.GetTemp() + rx.GetNoiseTemperature())
        emit = np.asarray(out.agg.emit)
        received = np.asarray(out.received)
        power = np.asarray(out.agg.power)
        doppler = np.asarray(out.agg.doppler)
        delay = np.asarray(out.agg.delay)
        phase = np.asarray(out.agg.phase, np.float64) + np.asarray(out.agg.phase_lo, np.float64)
        times = np.asarray(batch.times)
        for p in range(emit.shape[0]):
            for i in np.flatnonzero(emit[p]):
                rx = world.receivers[int(received[p, i])]
                point = InterpPoint(
                    power=float(power[p, i]),
                    time=float(times[p]) + float(delay[p, i]),
                    delay=float(delay[p, i]),
                    doppler=float(doppler[p, i]),
                    phase=float(phase[p, i]),
                    noise_temperature=rx.GetNoiseTemperature(),
                )
                response = Response(wave, trans)
                response.AddInterpPoint(point)
                rx.AddResponse(response)
    return out
