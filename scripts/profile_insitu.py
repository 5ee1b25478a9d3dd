"""IN-SITU stage-removal profile of the REAL production CPI.

The isolated 2-segment harnesses (profile_shading3 / profile_hit4)
overstate body costs because they defeat the fusion the real 4-segment
CPI gets (r3h lesson: isolated shading 12.9 ms vs 3.96 in situ).  This
script monkey-patches one ingredient at a time and re-traces the REAL
``trace_cpi`` (bench config, compact_narrow AUTO, agg/post included),
clearing the jit cache between stages.  Stage deltas vs the full run are
the true in-situ marginals.  Values change under the stubs — timing
only.

Run alone (the axon tunnel serialises TPU processes).  Each stage is a
fresh compile (~minutes on a cold cache).
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B

ap = argparse.ArgumentParser()
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=63)
ap.add_argument("--tris", type=int, default=1000000)
ap.add_argument("--repeat", type=int, default=3)
ap.add_argument("--ray-tile", type=int, default=512)
ap.add_argument("--sub-tiles", type=int, default=8)
ap.add_argument(
    "--scene", choices=("terrain", "moving", "dielectric"), default="terrain",
    help="bench scene; traversal knobs follow bench._SCENE_DEFAULTS "
    "(r5: configs 2/3 get the same marginal decomposition as terrain)",
)
ap.add_argument("--refine", action="store_true", help="profile with ds replay ON")
ap.add_argument("--shade-emit", action="store_true")
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=args.tris, rays=args.rays, pulses=args.pulses, repeat=args.repeat,
    tri_chunk=2048, scene=args.scene, accel="cluster", cluster_size=None,
    ray_tile=args.ray_tile, candidates=None, sub_tiles=args.sub_tiles,
    mt_group=None, mt_union=True, cand_order="near",
    p1_fanout=None, p1_super_k=None, p1_fanout0=None, p1_super_k0=None,
    fan_order="raster", refine=args.refine, replay_cap=256,
    compact_narrow=-1, agg_cap=4096, shade_emit=args.shade_emit,
    tiny=False, cpi256=False, stats=False,
)
# terrain keeps the historical r4e knobs for ledger continuity
if args.scene == "terrain":
    bargs.cluster_size, bargs.candidates, bargs.mt_group = 128, 64, 8
    bargs.p1_fanout, bargs.p1_super_k = 8, 12
base, batch, cfg, spec = B.build(bargs)[:4]
P = args.pulses

import rts_tpu.ops as ops_mod
import rts_tpu.engine.wavefront as wf
from rts_tpu.engine import cpi as cpi_mod

_orig_gather = wf._shade_rows
_orig_scatter = wf._scatter_col
_orig_miss = wf._process_miss
_orig_hit = wf._process_hit
_orig_chc = ops_mod.closest_hit_clustered


def run_once():
    out = cpi_mod.trace_cpi(base, batch, cfg, spec)
    # device-side reduction + SCALAR readback: np.asarray(out.power)
    # would drag the whole [P, lanes] array over the tunnel (~16 MB at
    # P=16 ≈ +22 ms/pulse of pure transfer — the r4 insitu ghost)
    return float(out.power.sum())


def timed(name):
    cpi_mod._trace_cpi_jit.clear_cache()
    jax.clear_caches()
    run_once()  # compile
    run_once()  # tunnel warm-up discard (post-compile runs can be slow)
    best = np.inf
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / P * 1000:.2f} ms/pulse", flush=True)
    return best / P


def restore():
    wf._shade_rows = _orig_gather
    wf._scatter_col = _orig_scatter
    wf._process_miss = _orig_miss
    wf._process_hit = _orig_hit
    ops_mod.closest_hit_clustered = _orig_chc


def _min_hit(state, bufs, hit, hit_mask, scene, tx_origin, cfg_, n3, spawn=True):
    gate = hit_mask & ~state.end
    hit_t = jnp.where(gate, hit.t.astype(state.origin.dtype), 0.0)
    origin = jnp.where(gate, state.origin + hit_t[None] * state.direction, state.origin)
    refl_depth = jnp.where(gate, state.refl_depth + 1, state.refl_depth)
    active = (gate & (refl_depth < cfg_.max_refl_dev)) | (~hit_mask & state.active)
    return (
        state._replace(origin=origin, refl_depth=refl_depth, active=active,
                       ray_length=state.ray_length + hit_t),
        bufs,
    )


def _stub_kernel(origin, direction, tmin, tri_pack, mn, mx, sort_origin=None, **kw):
    # Synthetic all-hit at t=60 m: keeps ~every lane alive through the
    # bounce chain like the nadir-terrain workload, so the non-kernel
    # stages see production-shaped masks.
    from rts_tpu.engine.intersect import HitResult

    l = origin.shape[-1]
    f = origin.dtype
    return HitResult(
        t=jnp.full((l,), 60.0, f),
        tri=jnp.zeros((l,), jnp.int32),
        beta=jnp.full((l,), 0.2, f),
        gamma=jnp.full((l,), 0.2, f),
        found=jnp.ones((l,), bool),
    )


restore()
full = timed("full production CPI")

# keep the liveness flow (missing lanes die either way) so narrow
# compaction engages as in production; only the capture math is removed
wf._process_miss = lambda state, mm, rx, tx, cfg_: state._replace(
    active=jnp.where(mm, False, state.active)
)
nomiss = timed("  - process_miss")
restore()

wf._scatter_col = lambda buf, col, val, mask: buf
nosc = timed("  - path/tri_seq scatters")
restore()

wf._shade_rows = lambda table, tri: jnp.zeros(
    (table.shape[1], tri.shape[0]), table.dtype
)
nog = timed("  - shade gather")
restore()

wf._process_hit = _min_hit
minh = timed("  - hit body -> minimal floor")
restore()

ops_mod.closest_hit_clustered = _stub_kernel
nok = timed("  - kernel (+phase1) -> all-hit stub")
restore()

# drift check: if the session's full-run time moved, marginals are junk
full2 = timed("full production CPI (re-measure)")
drift = abs(full2 - full) / full
print(f"# drift: {drift * 100:.1f}% (marginals unreliable above ~5%)")

print(
    f"# in-situ marginals (ms/pulse, {args.rays}^3, P={P}): "
    f"miss {(full - nomiss) * 1000:.2f}, scatters {(full - nosc) * 1000:.2f}, "
    f"gather {(full - nog) * 1000:.2f}, hit-body-above-floor {(full - minh) * 1000:.2f}, "
    f"kernel+p1 {(full - nok) * 1000:.2f}, full {full * 1000:.2f}"
)
print("INSITU DONE")
