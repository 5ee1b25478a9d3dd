"""Benchmark: traced rays/sec/chip on the wavefront engine.

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N / 1e9}

Baseline (BASELINE.md): north-star >= 1e9 traced rays/sec/chip on a
1M-triangle scene (the reference publishes no numbers of its own).
A "ray" is one primary launch cell traced through ALL its bounces and
refraction children (the reference's N^3 launch count, ray_tracer.cpp:1165).

Usage:
  python bench.py            # standard config
  python bench.py --tiny     # fast smoke run (CI / CPU)
  python bench.py --tris N --rays N --pulses N --repeat N
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


# Scene-aware traversal defaults (None CLI value = use these).  Terrain
# (sheet geometry, dense tile-level overlap) prefers fine clusters;
# sphere-SHELL targets need coarse clusters + wide phase-1 admission so
# whole shells fit the candidate lists (docs/PERF.md r6: the moving
# scene was 41x slower on the terrain knobs — every sphere tile
# overflowed into the scalar sweep).
_SCENE_DEFAULTS = {
    # mt_prune: running-best window prune — +34% on shells (front faces
    # occlude back faces + farther spheres; docs/PERF.md r5d), ~neutral
    # on terrain (kept off there).  The single-sphere scene is a shell
    # too: shell knobs + prune measured 5.40e6 vs 3.25e6 on the terrain
    # knobs (r5f/r5g).
    "moving": dict(cluster_size=1024, candidates=128, mt_group=1,
                   p1_fanout=16, p1_super_k=32, mt_prune=True),
    "sphere": dict(cluster_size=1024, candidates=128, mt_group=1,
                   p1_fanout=16, p1_super_k=32, mt_prune=True),
}
_BASE_DEFAULTS = dict(cluster_size=128, candidates=48, mt_group=8,
                      p1_fanout=8, p1_super_k=10, mt_prune=False)


def _scene_default(args, name):
    v = getattr(args, name, None)
    if v is not None:
        return v
    return _SCENE_DEFAULTS.get(args.scene, {}).get(name, _BASE_DEFAULTS[name])


def build(args):
    import jax.numpy as jnp
    import numpy as np

    from rts_tpu import Parameters
    from rts_tpu.sim import Path, RadarSignal, Receiver, Target, Transmitter, World, prepare_cpi

    w = World()
    w.add(
        Transmitter(
            path=Path.fixed(0, 0, 0),
            wave=RadarSignal(carrier=10e9),
            pulse_count=args.pulses,
            prf=1000.0,
            tx_span=(0.15, 0.15, 0.0),
        )
    )
    # Generous capture sphere + an odd N (boresight ray included) so the
    # bench exercises capture/aggregation with real received paths.
    w.add(Receiver(path=Path.fixed(0, 0, 0), sphere=(25.0, 1.2, 1.2)))
    if args.scene == "dielectric":
        # BASELINE config 3 shape: multistatic Tx + 2 Rx, dielectric
        # target (reflect+refract, 3x lane slots, 6 wavefront segments)
        # in front of a large terrain.  Forward Rx catches exiting
        # refraction chains.
        from rts_tpu.sim import RotationPath

        n = max(2, round(math.sqrt(args.tris / 2)) + 1)
        w.transmitters[0].path = Path.fixed(0.0, 0.0, 4000.0)
        w.receivers[0].path = Path.fixed(0.0, 0.0, 4000.0)
        el = -math.pi / 2
        w.transmitters[0].rotation = RotationPath(elevation=el)
        w.receivers[0].rotation = RotationPath(elevation=el)
        # forward receiver under the slab looking up
        w.add(
            Receiver(
                path=Path.fixed(0.0, 0.0, 100.0),
                rotation=RotationPath(elevation=math.pi / 2),
                sphere=(60.0, 1.4, 1.4),
            )
        )
        w.add(
            Target(
                shape="terrain",
                terrain=(n, 12000.0, 300.0, 3),
                path=Path.fixed(0.0, 0.0, 0.0),
                refl_coeff=0.9,
            )
        )
        from rts_tpu.sim import AttitudePath

        # dielectric plate between radar and terrain
        w.add(
            Target(
                shape="rect",
                rect=(2.0, 200.0, 200.0),
                attitude=AttitudePath(pitch=math.pi / 2),
                path=Path.fixed(0.0, 0.0, 1000.0),
                refl_coeff=0.5,
                refr_index=1.5,
            )
        )
    elif args.scene == "terrain":
        # BASELINE config 4: large terrain viewed from altitude (steep
        # look angle so near-specular facets return toward the radar).
        n = max(2, round(math.sqrt(args.tris / 2)) + 1)
        w.transmitters[0].path = Path.fixed(0.0, 0.0, 4000.0)
        w.receivers[0].path = Path.fixed(0.0, 0.0, 4000.0)
        w.add(
            Target(
                shape="terrain",
                terrain=(n, 12000.0, 300.0, 3),
                path=Path.fixed(0.0, 0.0, 0.0),
                refl_coeff=0.9,
            )
        )
        # calibration plate above the terrain: guaranteed specular return
        # so capture + aggregation run with real paths
        from rts_tpu.sim import AttitudePath

        w.add(
            Target(
                shape="rect",
                rect=(2.0, 60.0, 60.0),
                attitude=AttitudePath(pitch=math.pi / 2),
                path=Path.fixed(0.0, 0.0, 400.0),
                refl_coeff=0.9,
            )
        )
        from rts_tpu.sim import RotationPath

        el = -math.pi / 2
        w.transmitters[0].rotation = RotationPath(elevation=el)
        w.receivers[0].rotation = RotationPath(elevation=el)
    elif args.scene == "moving":
        # BASELINE config 2: multi-target moving scene — per-pulse
        # retrace with Doppler phase accumulation across the CPI
        # (reference shape: ray_tracer.cpp:843-1333, per-pulse BVH
        # rebuild + kernel relaunch).  Four icospheres at distinct
        # ranges/radial speeds so the range/Doppler map separates them.
        # A sphere only retroreflects into the monostatic capture sphere
        # when a launch ray passes (almost) exactly through its centre,
        # so the centres sit on the u in {0, 1/2, 1} fan grid nodes —
        # directions that exist for EVERY odd-N fan (beam centre and
        # edge midpoints of the Cartesian corner interpolation,
        # engine/fan.py; ray_tracer.cu:144-209).
        from rts_tpu.engine.fan import generate_fan
        import numpy as _np

        dirs = _np.asarray(
            generate_fan(3, (0.0, 0.0), (0.15, 0.15, 0.0), dtype=jnp.float32),
            _np.float64,
        )  # [27, 3]; ray = iz*9 + iy*3 + ix, directions constant in ix
        subdivs = max(0, round(math.log(max(args.tris // 4, 20) / 20.0, 4.0)))
        for node, rng, spd in (
            (12, 900.0, -50.0),   # beam centre (iz=1, iy=1)
            (9, 1400.0, 80.0),    # left edge midpoint (iz=1, iy=0)
            (15, 2000.0, -140.0), # right edge midpoint (iz=1, iy=2)
            (3, 2600.0, 30.0),    # bottom edge midpoint (iz=0, iy=1)
        ):
            d = dirs[node] / _np.linalg.norm(dirs[node])
            p0 = tuple(rng * d)
            p1 = tuple((rng + spd) * d)  # radial motion: clean Doppler line
            w.add(
                Target(
                    path=Path.linear([(0.0, p0), (1.0, p1)]),
                    shape="sphere",
                    sphere_params=(subdivs, 60.0),
                    refl_coeff=0.9,
                )
            )
    else:
        # Icosphere subdivision count reaching ~args.tris triangles (20*4^s).
        subdivs = max(0, round(math.log(max(args.tris, 20) / 20.0, 4.0)))
        w.add(
            Target(
                path=Path.linear([(0.0, (900.0, 0.0, 0.0)), (1.0, (950.0, 0.0, 0.0))]),
                shape="sphere",
                sphere_params=(subdivs, 60.0),
                refl_coeff=0.9,
            )
        )
    params = Parameters(
        num_rays=args.rays, max_refl_depth=2,
        max_refr_depth=2 if args.scene == "dielectric" else 0,
    )
    base, batch, cfg, spec = prepare_cpi(
        w,
        params,
        dtype=jnp.float32,
        tri_chunk=args.tri_chunk,
        accel=args.accel,
        cluster_size=_scene_default(args, "cluster_size"),
        ray_tile=args.ray_tile if args.ray_tile is not None else 512,
        candidates=_scene_default(args, "candidates"),
        sub_tiles=args.sub_tiles if args.sub_tiles is not None else 8,
        mt_group=_scene_default(args, "mt_group"),
        mt_union=args.mt_union,
        mt_tail=getattr(args, "mt_tail", True),
        mt_prune=_scene_default(args, "mt_prune"),
        cand_order=args.cand_order,
        resident_cap=getattr(args, "resident_cap", 0),
        shade_emit=getattr(args, "shade_emit", False),
        p1_fanout=_scene_default(args, "p1_fanout"),
        p1_super_k=_scene_default(args, "p1_super_k"),
        p1_fanout0=getattr(args, "p1_fanout0", None),
        p1_super_k0=getattr(args, "p1_super_k0", None),
        compact_narrow=getattr(args, "compact_narrow", 0),
        fan_order=args.fan_order,
        refine=args.refine,
        # caps sized to the bench scenes' received counts (~N lanes/pulse
        # at the N^3 fans, 2x headroom; overflow is guarded/exact) —
        # 256/4096 measured -3.5% on the headline (docs/PERF.md r6c)
        replay_cap=args.replay_cap if args.replay_cap is not None else 128,
        agg_cap=args.agg_cap if getattr(args, "agg_cap", None) is not None else 1024,
        rcs_angles=getattr(args, "rcs_angles", None),
    )
    return base, batch, cfg, spec, int(base.tri_verts.shape[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1000000, help="approx. triangle count")
    # 63^3 amortises per-pulse fixed costs best (PERF.md: 2.26e6 vs
    # 2.13e6 at 31^3); odd N keeps the exact boresight ray.
    ap.add_argument("--rays", type=int, default=63, help="N of the N^3 launch fan (odd keeps the boresight ray)")
    # Whole-CPI batching is the production shape; 128 pulses amortise the
    # ~27 ms tunnel dispatch+readback floor to ~0.2 ms/pulse (PERF.md).
    ap.add_argument("--pulses", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--tri-chunk", type=int, default=2048)
    ap.add_argument("--scene", choices=("sphere", "terrain", "dielectric", "moving"), default="terrain")
    ap.add_argument("--accel", choices=("brute", "cluster"), default="cluster")
    ap.add_argument("--cluster-size", type=int, default=None, help="triangles per Morton cluster (None = scene default: 128; moving 1024)")
    ap.add_argument(
        "--ray-tile", type=int, default=None,
        help="ray rows per kernel grid step (default 512; the 31^3 cpi256 "
        "leg auto-picks 256 with sub_tiles=4 — measured 2.42 vs 2.59 s, "
        "docs/PERF.md r6a — unless set explicitly)",
    )
    ap.add_argument(
        "--candidates", type=int, default=None,
        help="per-tile candidate-list width (two-phase traversal); 0 = hierarchical sweep",
    )
    ap.add_argument(
        "--fan-order", choices=("raster", "morton3", "morton2"), default="raster",
        help="fan tile order (morton2 = compact angular patches, launch-range axis minor)",
    )
    ap.add_argument(
        "--sub-tiles", type=int, default=None,
        help="slab-gated ray sub-blocks per tile in the MT kernel",
    )
    ap.add_argument(
        "--mt-group", type=int, default=None,
        help="candidates per MT evaluation window in the kernel (1/2/4/8/16/32)",
    )
    ap.add_argument(
        "--mt-union", action=argparse.BooleanOptionalAction, default=True,
        help="one G*cs-wide union-gated MT per step (vs G-unrolled per-candidate windows)",
    )
    ap.add_argument(
        "--mt-tail", action=argparse.BooleanOptionalAction, default=True,
        help="half-width tail window: pad candidate lists to G/2 and evaluate "
        "one G/2-wide window when the remainder fits (trims padded columns; "
        "production default since r5a: +1.7%%)",
    )
    ap.add_argument(
        "--mt-prune", action=argparse.BooleanOptionalAction, default=None,
        help="running-best candidate-window prune (exact): skip sub-block "
        "MT evals whose window entry distance exceeds the rows' current "
        "best (None = scene default)",
    )
    ap.add_argument(
        "--shade-emit", action=argparse.BooleanOptionalAction, default=False,
        help="kernel-epilogue shade emit: the traversal kernel extracts the "
        "winner's corner normals + target id (32-row pack) instead of the "
        "hit body's [T,10] row gather (bit-identical; A/B docs/PERF.md r5)",
    )
    ap.add_argument(
        "--resident-cap", type=int, default=0,
        help="keep up to N live clusters VMEM-resident; candidate windows "
        "assemble by VMEM-local copies instead of HBM DMAs (0 = off; "
        "live-set overflow falls back to the hierarchical sweep)",
    )
    ap.add_argument(
        "--cand-order", choices=("near", "mask"), default="near",
        help="candidate-list order: near-to-far, or grouped by sub-block bitmask "
        "so G-window union gates stay tight (model: 0.81x MT pairs)",
    )
    ap.add_argument(
        "--p1-fanout", type=int, default=None,
        help="phase-1 clusters per supergroup box (default: module constant 16)",
    )
    ap.add_argument(
        "--p1-super-k", type=int, default=None,
        help="phase-1 admitted supergroups per tile; level-2 width = K*fanout "
        "slots (default 16; bench terrain admits ~6.2, max 11)",
    )
    ap.add_argument(
        "--p1-fanout0", type=int, default=None,
        help="phase-1 supergroups per level-0 run (default: module constant 8)",
    )
    ap.add_argument(
        "--p1-super-k0", type=int, default=None,
        help="phase-1 admitted level-0 runs per tile; level-1 re-test width "
        "= K0*fanout0 slots (default 12; bench terrain admits ~2-4)",
    )
    ap.add_argument(
        "--compact-narrow", type=int, default=-1,
        help="late-segment narrow tile budget divisor (0 = off, -1 = auto "
        "live-tile budget max(8, tiles//24) — the production default): "
        "gather live ray tiles into a narrow block once they fit",
    )
    ap.add_argument(
        "--rcs-angles", dest="rcs_angles", default=None,
        type=lambda v: v.lower() in ("1", "true", "on"),
        help="force per-bounce RCS angle recording on/off (default: auto "
             "from the scene's RCS models; bench targets are IsoRCS -> off)",
    )
    ap.add_argument("--tiny", action="store_true", help="fast smoke configuration")
    ap.add_argument("--stats", action="store_true", help="print traversal workload counters (stderr)")
    ap.add_argument(
        "--refine",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="double-single path replay ON (the production 1e-6 power/phase config)",
    )
    ap.add_argument(
        "--replay-cap", type=int, default=None,
        help="compact received lanes and replay only this many (0 = all); "
        "the bench scenes receive ~31 lanes per pulse, and the overflow "
        "guard (sim.check_replay_overflow) makes a tight cap safe",
    )
    ap.add_argument(
        "--agg-cap", type=int, default=None,
        help="aggregate a compacted received-lane block instead of the "
        "full fan (exact: lax.cond falls back to full-lane aggregation "
        "on overflow); 0 = full-lane aggregation",
    )
    ap.add_argument(
        "--cpi256",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="also time one full 256-pulse CPI (BASELINE config 5 tracked metric)",
    )
    args = ap.parse_args()
    if args.tiny:
        args.tris, args.rays, args.pulses, args.repeat, args.tri_chunk = 320, 3, 2, 1, 128
        args.accel = "brute"
        args.cpi256 = False
        # sphere scene: a 320-tri terrain is ~900 m random facets that
        # capture nothing; the smoke should exercise capture+aggregation
        args.scene = "sphere"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rts_tpu.engine.cpi import trace_cpi

    base, batch, cfg, spec, n_tris = build(args)
    rays_per_run = cfg.rays_per_fan * args.pulses

    # warm-up / compile.  NOTE: block_until_ready can return early over a
    # tunnelled device — a scalar readback is the reliable sync.
    out = trace_cpi(base, batch, cfg, spec)
    float(out.power.sum())

    best = math.inf
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        out = trace_cpi(base, batch, cfg, spec)
        float(out.power.sum())
        best = min(best, time.perf_counter() - t0)

    value = rays_per_run / best
    received = int((out.received >= 0).sum())

    cpi256_seconds = None
    if args.cpi256:
        # BASELINE config 5: wall-clock for one full 256-pulse CPI on the
        # same scene (one jit call, warm compile, scalar-readback sync).
        args256 = argparse.Namespace(**vars(args))
        args256.pulses = 256
        # the tracked cpi256 metric stays at the 31^3 fan for continuity
        # with rounds 1-2 (the headline rays/s metric uses --rays)
        args256.rays = 31
        # measured 31^3 preferences (docs/PERF.md r6c sweep): finer ray
        # tiles + shorter candidate lists + caps sized to the ~31
        # received lanes/pulse (the overflow guards keep tight caps
        # safe/exact) — 2.585 s at the 63^3 knobs, 1.854 tuned.
        # Explicit flags override.  Scenes with their own _SCENE_DEFAULTS
        # entry (shell targets) keep those: the 31^3 overrides are
        # terrain-tuned, and e.g. candidates=32 on the moving scene would
        # re-create the 41x scalar-sweep collapse the wide-admission
        # defaults exist to prevent.
        if args.scene not in _SCENE_DEFAULTS:
            if args.ray_tile is None:
                args256.ray_tile = 128
            if args.sub_tiles is None:
                args256.sub_tiles = 2
            if args.candidates is None:
                args256.candidates = 32
        if args.replay_cap is None:
            args256.replay_cap = 64
        if getattr(args, "agg_cap", None) is None:
            args256.agg_cap = 1024
        b256, batch256, cfg256, spec256 = build(args256)[:4]
        out256 = trace_cpi(b256, batch256, cfg256, spec256)
        float(out256.power.sum())
        t0 = time.perf_counter()
        out256 = trace_cpi(b256, batch256, cfg256, spec256)
        float(out256.power.sum())
        cpi256_seconds = time.perf_counter() - t0
        print(f"# cpi256: {cpi256_seconds:.3f}s per 256-pulse CPI", file=sys.stderr)

    if args.stats and args.accel == "cluster":
        import numpy as np

        from rts_tpu.engine.animate import animate_packed
        from rts_tpu.engine.fan import generate_fan
        from rts_tpu.ops import closest_hit_clustered

        sc = animate_packed(
            base, batch.rot[0], batch.pos[0], batch.vel[0], cfg.cluster_size
        )
        fan = generate_fan(
            cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]), spec.kwargs()["tx_span"]
        )
        import jax.numpy as jnp

        if cfg.fan_order != "raster":
            from rts_tpu.engine.fan import fan_tile_perm

            fan = fan[jnp.asarray(fan_tile_perm(cfg.num_rays, cfg.fan_order))]

        tmin = jnp.full((fan.shape[0],), 0.005, jnp.float32)
        origin = jnp.broadcast_to(batch.tx_origin[0], fan.shape)
        _, stats = closest_hit_clustered(
            origin, fan, tmin, sc.tri_pack, sc.aabb_mn, sc.aabb_mx, batch.tx_origin[0],
            cluster_size=cfg.cluster_size, ray_tile=cfg.ray_tile,
            group_size=cfg.group_size, sub_tiles=cfg.sub_tiles,
            candidates=cfg.candidates, with_stats=True,
        )
        stats = np.asarray(stats)
        n_groups = -(-(n_tris // cfg.cluster_size) // cfg.group_size)
        print(
            f"# traversal stats (segment 1): {stats.shape[0]} tiles, "
            f"groups visited/tile mean {stats[:, 0].mean():.1f} of {n_groups}, "
            f"clusters processed/tile mean {stats[:, 1].mean():.1f} "
            f"(max {stats[:, 1].max()})",
            file=sys.stderr,
        )
    print(
        f"# {n_tris} tris, {cfg.rays_per_fan} rays/pulse x {args.pulses} pulses, "
        f"{cfg.num_segments} segments, best {best:.4f}s, received {received}, "
        f"platform {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    record = {
        "metric": "rays_per_sec_per_chip",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
    }
    if cpi256_seconds is not None:
        record["cpi256_seconds"] = cpi256_seconds
    print(json.dumps(record))


if __name__ == "__main__":
    main()
