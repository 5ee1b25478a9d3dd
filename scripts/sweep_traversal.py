"""Traversal-parameter sweep on the real TPU chip (1M-tri bench scene).

Measures rays/s for combinations of (cluster_size, group_size,
super_size, ray_tile, sub_tiles, fan N, refine) in ONE process so the
persistent compile cache and the scene build amortise.  Results append
to docs/PERF.md by hand — this prints a table.

Run (serializes with any other TPU process):
  python scripts/sweep_traversal.py [--tris 1000000] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1000000)
    ap.add_argument("--pulses", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rts_tpu import Parameters
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import (
        AttitudePath, Path, RadarSignal, Receiver, RotationPath, Target, Transmitter, World,
        prepare_cpi,
    )

    def world(pulses):
        w = World()
        w.add(Transmitter(path=Path.fixed(0, 0, 4000.0), wave=RadarSignal(carrier=10e9),
                          pulse_count=pulses, prf=1000.0, tx_span=(0.15, 0.15, 0.0)))
        w.add(Receiver(path=Path.fixed(0, 0, 4000.0), sphere=(25.0, 1.2, 1.2)))
        n = max(2, round(math.sqrt(args.tris / 2)) + 1)
        w.add(Target(shape="terrain", terrain=(n, 12000.0, 300.0, 3),
                     path=Path.fixed(0.0, 0.0, 0.0), refl_coeff=0.9))
        w.add(Target(shape="rect", rect=(2.0, 60.0, 60.0),
                     attitude=AttitudePath(pitch=math.pi / 2),
                     path=Path.fixed(0.0, 0.0, 400.0), refl_coeff=0.9))
        el = -math.pi / 2
        w.transmitters[0].rotation = RotationPath(elevation=el)
        w.receivers[0].rotation = RotationPath(elevation=el)
        return w

    # (label, rays, cs, gs, super, rt, st, refine)
    configs = [
        ("f63-cs1024-3lvl", 63, 1024, 16, 8, 512, 8, False),  # round-2 best
        ("f63-cs1024-gs8s8", 63, 1024, 8, 8, 512, 8, False),
        ("f63-cs1024-gs16s16", 63, 1024, 16, 16, 512, 8, False),
        ("f63-cs1024-st4", 63, 1024, 16, 8, 512, 4, False),
        ("f63-cs2048-3lvl", 63, 2048, 16, 4, 512, 8, False),
        ("f95-cs1024-3lvl", 95, 1024, 16, 8, 512, 8, False),
        ("f63-cs1024-rt1024", 63, 1024, 16, 8, 1024, 16, False),
        ("f63-best+refine", 63, 1024, 16, 8, 512, 8, True),
    ]
    if args.quick:
        configs = configs[:2]

    prepared = {}
    print(f"{'config':22s} {'rays/s':>12s} {'ms/pulse':>9s} {'received':>9s}")
    for label, rays, cs, gs, sup, rt, st, refine in configs:
        key = (rays, cs, refine)
        if key not in prepared:
            w = world(args.pulses)
            params = Parameters(num_rays=rays, max_refl_depth=2)
            prepared[key] = prepare_cpi(
                w, params, dtype=jnp.float32, accel="cluster",
                cluster_size=cs, ray_tile=rt, refine=refine, replay_cap=16384,
            )
        base, batch, cfg, spec = prepared[key]
        cfg = dataclasses.replace(cfg, group_size=gs, super_size=sup, ray_tile=rt, sub_tiles=st)
        try:
            out = trace_cpi(base, batch, cfg, spec)
            float(out.power.sum())
            best = math.inf
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                out = trace_cpi(base, batch, cfg, spec)
                float(out.power.sum())
                best = min(best, time.perf_counter() - t0)
            rps = cfg.rays_per_fan * args.pulses / best
            rec = int((out.received >= 0).sum())
            print(f"{label:22s} {rps:12.3e} {best / args.pulses * 1e3:9.2f} {rec:9d}", flush=True)
        except Exception as e:  # keep sweeping past one bad config
            print(f"{label:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
