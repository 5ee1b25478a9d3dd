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


# Named option bundles for ``prepare_cpi``.  "production" is the
# measured-best TPU configuration from the bench ledger (docs/PERF.md):
# clustered Pallas traversal, 128-triangle clusters, 512-ray tiles with
# 8 bit-gated sub-blocks, 64-wide candidate lists evaluated 8 clusters
# per 1024-wide MT window (mt_group), and the double-single path replay
# ON so the f32 engine meets the reference's double-precision 1e-6
# power/phase contract (ray_tracer.h:13-28).
PRESETS = {
    "production": dict(
        accel="cluster",
        cluster_size=128,
        ray_tile=512,
        candidates=48,
        sub_tiles=8,
        mt_group=8,
        # phase-1 hierarchy, measured best (docs/PERF.md r6d sweep after
        # the target-major clustering change: cand48+K10 6.86e6 vs
        # cand64+K12 6.74 at P=16; the r3-era "K=10 pays overflows"
        # verdict flipped once the cal plate stopped polluting terrain
        # clusters)
        p1_fanout=8,
        p1_super_k=10,
        # half-width tail window: trims the padded-duplicate columns of
        # the last MT window (r5a hardware A/B: +1.7%, 6.86 -> 6.98e6 at
        # P=16; the r3h "neutral" verdict flipped at the packed-IO
        # kernel — docs/PERF.md r5a)
        mt_tail=True,
        refine=True,
        # replay block size; received lanes beyond the cap keep f32 and
        # check_replay_overflow warns LOUDLY — raise it (or 0 = all)
        # for wide-beam close-range scenes
        replay_cap=256,
        # tile-granular narrow late segments, AUTO live-tile budget
        # (max(8, tiles//24)): bit-identical, lax.cond fallback while
        # wide; the single biggest r3 bench win (2.87 -> 4.4e6 rays/s
        # at a 63³ fan — docs/PERF.md r3j/r3k narrow sweep)
        compact_narrow=-1,
    ),
    # exact-parity oracle configuration: dense f64 engine with the
    # reference's float32 narrowing points applied
    "parity": dict(strict_parity=True),
}

_PREPARE_DEFAULTS = dict(
    strict_parity=False,
    tri_chunk=512,
    pad_tris_to=1,
    accel="brute",
    cluster_size=256,
    ray_tile=256,
    candidates=64,
    sub_tiles=4,
    mt_group=2,
    mt_union=True,
    mt_tail=False,
    mt_prune=False,
    cand_order="near",
    resident_cap=0,
    # kernel-epilogue shade emit (TraceConfig.shade_emit): the traversal
    # kernel extracts the winner's corner normals + target id instead of
    # the hit body's [T, 10] row gather; bit-identical, A/B'd on
    # hardware in docs/PERF.md r5
    shade_emit=False,
    p1_fanout=None,
    p1_super_k=None,
    p1_fanout0=None,
    p1_super_k0=None,
    compact_narrow=0,
    agg_cap=4096,
    fan_order="raster",
    interpret=False,
    refine=False,
    replay_cap=0,
    # Evaluate the [P, NR] receiver-sphere geometry ON DEVICE in one
    # fused computation (physics/receiver_geom.rx_sphere_geometry_device)
    # instead of host NumPy — keeps host prep flat for very long CPIs.
    # Incompatible with refine=True (the replay needs f64 host centres).
    rx_geom_on_device=False,
    # None = auto: record per-bounce RCS angle sums only when some
    # target's RCS model actually reads them (aspect_free attribute,
    # physics/rcs.py).  True/False force.
    rcs_angles=None,
)


def prepare_cpi(
    world: World,
    params: Parameters,
    *,
    tx_index: int = 0,
    dtype=jnp.float32,
    preset: str | None = None,
    **options,
):
    """Compile (base scene, pulse batch, cfg, spec) for one transmitter's CPI.

    ``preset`` selects a named option bundle (``PRESETS``); explicit
    keyword options override the preset.  ``preset="production"`` is the
    measured-best TPU configuration and the recommended starting point.
    Recognised options and their bare defaults: ``strict_parity=False,
    tri_chunk=512, pad_tris_to=1, accel="brute", cluster_size=256,
    ray_tile=256, candidates=64, sub_tiles=4, mt_group=2,
    fan_order="raster", interpret=False, refine=False, replay_cap=0,
    rx_geom_on_device=False, resident_cap=0,
    compact_narrow=0, agg_cap=4096`` (``compact_narrow=N`` = gather live
    ray tiles of nearly-dead late segments into a ceil(tiles/N)-tile
    block; ``resident_cap=N`` = VMEM-resident live-cluster pack, a
    measured loss on the bench — docs/PERF.md r4).

    ``refine=True`` additionally ships the double-single residuals and
    per-pulse fan rotations the extended-precision replay needs
    (engine/replay.py), so the f32 engine meets the reference's
    double-precision 1e-6 power/phase contract."""
    opts = dict(_PREPARE_DEFAULTS)
    if preset is not None:
        if preset not in PRESETS:
            raise ValueError(f"unknown preset {preset!r}; available: {sorted(PRESETS)}")
        opts.update(PRESETS[preset])
    if preset == "production":
        from rts_tpu.ops.cluster_trace import nondefault_experiment_flags

        stray = nondefault_experiment_flags()
        if stray:
            import warnings

            warnings.warn(
                f"preset='production' with non-default kernel experiment "
                f"env flags {stray} — results stay correct (FLOOR refuses "
                f"at import) but timings are not the measured production "
                f"configuration",
                stacklevel=2,
            )
    unknown = set(options) - set(opts)
    if unknown:
        raise TypeError(f"prepare_cpi() got unexpected options {sorted(unknown)}")
    opts.update(options)
    strict_parity = opts["strict_parity"]
    tri_chunk = opts["tri_chunk"]
    pad_tris_to = opts["pad_tris_to"]
    accel = opts["accel"]
    cluster_size = opts["cluster_size"]
    ray_tile = opts["ray_tile"]
    candidates = opts["candidates"]
    sub_tiles = opts["sub_tiles"]
    fan_order = opts["fan_order"]
    interpret = opts["interpret"]
    refine = opts["refine"]
    replay_cap = opts["replay_cap"]
    rx_geom_on_device = opts["rx_geom_on_device"]
    if rx_geom_on_device and refine:
        raise ValueError(
            "rx_geom_on_device=True is incompatible with refine=True: the ds "
            "replay needs the f64 host receiver centres for its residuals"
        )
    rcs_angles = opts["rcs_angles"]
    needs_angles = any(
        not getattr(t.rcs_model, "aspect_free", False) for t in world.targets
    )
    if rcs_angles is None:
        rcs_angles = needs_angles
    elif not rcs_angles and needs_angles:
        # An aspect-dependent RCS model (e.g. PlateRCS) evaluated with
        # rcs_angles=False would silently read the -1e6 sentinel angle
        # sums and corrupt received power — refuse.
        raise ValueError(
            "rcs_angles=False but some target's rcs_model is aspect-"
            "dependent (aspect_free is not True); its RCS would be "
            "evaluated on sentinel angles. Drop the override or use an "
            "aspect-free RCS model."
        )
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
        if rx_geom_on_device:
            # one fused [P, NR] device evaluation from waypoint arrays
            from rts_tpu.physics.receiver_geom import rx_sphere_geometry_device

            g = rx_sphere_geometry_device(
                jnp.asarray(rx_pos, dtype),
                jnp.asarray(rx_az, dtype),
                jnp.asarray(rx_el, dtype),
                jnp.broadcast_to(jnp.asarray(spheres[:, 0], dtype), (pulse_count, num_rx)),
                jnp.broadcast_to(jnp.asarray(spheres[:, 1], dtype), (pulse_count, num_rx)),
                jnp.broadcast_to(jnp.asarray(spheres[:, 2], dtype), (pulse_count, num_rx)),
                dtype=dtype,
            )
            geo = {
                "centre": g.centre,
                "radius": g.radius,
                "min_theta": g.min_theta,
                "max_theta": g.max_theta,
                "min_phi": g.min_phi,
                "max_phi": g.max_phi,
            }
        else:
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

        # per-pulse fan rotation r1 @ rz in f64 (mirrors engine/fan.py),
        # fully vectorised over the pulse axis — host prep stays flat in
        # P (a per-pulse Python loop here was the 10k-pulse prep wall)
        az = txd[:, 0].astype(np.float64)
        el = txd[:, 1].astype(np.float64)
        rz = rot_z(az, xp=np)  # [P, 3, 3]
        orth = rz[:, :, 1]
        orth = orth / np.linalg.norm(orth, axis=-1, keepdims=True)
        r1 = rot_axis_reversed(orth, el, xp=np)
        fan_rot = r1 @ rz
        bore = np.stack(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
        )
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
        mt_group=opts["mt_group"],
        mt_union=opts["mt_union"],
        mt_tail=opts["mt_tail"],
        mt_prune=opts["mt_prune"],
        cand_order=opts["cand_order"],
        resident_cap=opts["resident_cap"],
        shade_emit=opts["shade_emit"],
        p1_fanout=opts["p1_fanout"],
        p1_super_k=opts["p1_super_k"],
        p1_fanout0=opts["p1_fanout0"],
        p1_super_k0=opts["p1_super_k0"],
        compact_narrow=opts["compact_narrow"],
        agg_cap=opts["agg_cap"],
        fan_order=fan_order,
        interpret=interpret,
        refine=refine,
        replay_cap=replay_cap,
        rcs_angles=rcs_angles,
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


def check_replay_overflow(out: CpiResult, cfg: TraceConfig, *, warn: bool = True):
    """Guard the ds-replay precision contract against cap overflow.

    ``cfg.replay_cap`` bounds how many received lanes the extended-
    precision replay re-evaluates (engine/replay.py); lanes beyond the
    cap silently keep f32 values, breaking the reference's 1e-6
    power/phase contract (ray_tracer.h:13-28).  Returns the per-pulse
    received-lane counts ([P] int array) and, when ``warn`` and any
    pulse exceeds the cap, raises a loud ``UserWarning`` naming the
    worst pulse so the downgrade can never pass unnoticed.  Call it on
    every production trace; ``run_cpi`` does so automatically.
    """
    import warnings as _warnings

    counts = np.asarray((np.asarray(out.received) >= 0).sum(axis=1))
    if cfg.refine and cfg.replay_cap and counts.size:
        worst = int(counts.max())
        if worst > cfg.replay_cap:
            over = int((counts > cfg.replay_cap).sum())
            msg = (
                f"ds replay cap overflow: {over} pulse(s) received more lanes "
                f"than replay_cap={cfg.replay_cap} (worst {worst}); lanes beyond "
                "the cap keep f32 precision and BREAK the 1e-6 power/phase "
                "contract. Raise replay_cap (or set 0 = replay all lanes)."
            )
            if warn:
                _warnings.warn(msg, UserWarning, stacklevel=2)
    return counts


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
    preset: str | None = None,
    attach_responses: bool = True,
    **options,
) -> CpiResult:
    """Trace one transmitter's whole CPI in a single jit call, then
    (optionally) attach Responses exactly like the sequential driver.
    ``preset``/``options`` are forwarded to :func:`prepare_cpi`."""
    base, batch, cfg, spec = prepare_cpi(
        world,
        params,
        tx_index=tx_index,
        dtype=dtype,
        preset=preset,
        **options,
    )
    out = trace_cpi(base, batch, cfg, spec)
    check_replay_overflow(out, cfg)

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
