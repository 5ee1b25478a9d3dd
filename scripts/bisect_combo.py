"""Bisect the r3h combo anomaly on the real chip.

r3h measured received=1953 (= 63 x 31) for --compact-narrow 8 --mt-tail
--shade-gather window at P=32 where baseline and every single feature
gave 2016 (= 63 x 32): exactly one pulse of a STATIC scene (identical
per-pulse inputs) lost all its receptions — either a flag-interaction
miscompile or hardware-level nondeterminism.  This script traces the
bench scene for each flag pair, 3 repeats each, and prints the
PER-PULSE received counts so we can see (a) which combos deviate,
(b) whether the deviation is deterministic across repeats.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench.py: the scene builder)

BASE = dict(
    tris=1000000, rays=63, pulses=32, repeat=1, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=128, ray_tile=512,
    candidates=64, fan_order="raster", sub_tiles=8, mt_group=8,
    mt_union=True, mt_tail=False, cand_order="near", p1_fanout=8,
    p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
    shade_gather="row", compact_narrow=0, tiny=False, stats=False,
    refine=True, replay_cap=256, cpi256=False,
)

CONFIGS = [
    ("combo(n8+tail+win)", dict(compact_narrow=8, mt_tail=True, shade_gather="window")),
    ("n8+tail", dict(compact_narrow=8, mt_tail=True)),
    ("n8+win", dict(compact_narrow=8, shade_gather="window")),
    ("tail+win", dict(mt_tail=True, shade_gather="window")),
    ("baseline", dict()),
    ("n8", dict(compact_narrow=8)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", type=str, default=None, help="substring filter on config name")
    args_cli = ap.parse_args()

    from rts_tpu.engine.cpi import trace_cpi

    for name, over in CONFIGS:
        if args_cli.only and args_cli.only not in name:
            continue
        args = argparse.Namespace(**{**BASE, **over})
        base, batch, cfg, spec, n_tris = bench.build(args)
        t0 = time.perf_counter()
        for r in range(args_cli.repeats):
            out = trace_cpi(base, batch, cfg, spec)
            rec = np.asarray(out.received)  # [...]; lanes with >= 0 were captured
            per_pulse = (rec >= 0).reshape(args.pulses, -1).sum(axis=1)
            total = int(per_pulse.sum())
            bad = np.nonzero(per_pulse != per_pulse[0])[0]
            print(
                f"{name} r{r}: total={total} per-pulse[0]={int(per_pulse[0])} "
                f"deviating-pulses={bad.tolist()[:8]}"
                + (f" counts={per_pulse[bad].tolist()[:8]}" if bad.size else ""),
                flush=True,
            )
        print(f"# {name}: {time.perf_counter() - t0:.1f}s for {args_cli.repeats} repeats", flush=True)


if __name__ == "__main__":
    main()
