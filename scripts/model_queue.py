"""Offline model: would a sorted-work-queue MT kernel beat the candidate
window kernel? (VERDICT r3 "next round" #4 — the successor-family spike,
step 1: a measured go/no-go before any kernel build.)

The queue family replaces per-TILE candidate lists with explicit
(ray-block, cluster) work items so only overlapping work is evaluated:

  A. per-ray exact queue — pairs sorted by cluster; each cluster's rays
     are gathered into contiguous rows and evaluated as [rows, cs]
     windows.  Eliminates BOTH union waste and block-admission waste
     (the r3 ceiling analysis's "per-ray-exact work queues").
  B. sub-block queue at 128-ray granularity — (tile-quarter, cluster)
     items; 128-ray row blocks are lane-aligned slices of the engine's
     lane-major ray pack, so NO per-ray gather is needed (the layout
     constraint that makes A "a different kernel family").

This script computes, on the real bench geometry (1M-tri terrain, 63^3
fan, production config), each variant's
  - evaluated MT pairs/ray (incl. row-block padding),
  - scalar window/sub-block event counts,
  - modelled kernel time from the r4a-measured calibration:
      MT flops at the measured 2.5 Tf/s effective rate
      (7.6 ms per live segment / 1520 HW pairs/ray),
      row floor 5.1 ns per processed ray row (r4a packed-IO dead floor
      2.62 us/tile / 512 rows),
      scalar events at 0.1-0.3 us each (r3k calibration band),
and prints a go/no-go per variant.  The pair-reorder build cost (sort /
gather machinery OUTSIDE the kernel) is modelled as a lower bound from
HBM traffic and flagged separately — variant A needs a 3M-element
sort per segment that XLA cannot do cheaply on TPU.

Reference being replaced: the per-candidate scheduling OptiX hides in
rtTrace (/root/reference/ray_tracer.cu:243, triangle_mesh.cu:142-200).

Run on CPU:  JAX_PLATFORMS=cpu python scripts/model_queue.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from model_reorder import slab_np  # noqa: E402

# r4a calibration (docs/PERF.md "r4a fresh cost map", production config)
MT_MS_PER_SEG = 7.6          # measured MT window time per live segment
HW_PAIRS_CURRENT = 1520.0    # HW pairs/ray the 7.6 ms evaluates (G=8 union)
ROW_FLOOR_NS = 5.1           # per processed 512-row... per ray-row (r4a)
EVENT_US = (0.1, 0.3)        # scalar event cost band (r3k)
N_RAYS_LIVE = 250047.0


def variant_report(name, pairs_per_ray, rows_processed, events, extra_ms=0.0,
                   note=""):
    mt_ms = MT_MS_PER_SEG * pairs_per_ray / HW_PAIRS_CURRENT
    floor_ms = rows_processed * ROW_FLOOR_NS * 1e-6
    ev_lo = events * EVENT_US[0] * 1e-3
    ev_hi = events * EVENT_US[1] * 1e-3
    lo = mt_ms + floor_ms + ev_lo + extra_ms
    hi = mt_ms + floor_ms + ev_hi + extra_ms
    print(
        f"  {name:36s} {pairs_per_ray:7.0f} pairs/ray  "
        f"MT {mt_ms:5.2f} + floor {floor_ms:4.2f} + events {ev_lo:4.2f}-{ev_hi:4.2f}"
        f"{' + build %.2f' % extra_ms if extra_ms else ''}"
        f" = {lo:5.2f}-{hi:5.2f} ms/seg   {note}"
    )
    return lo, hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=63)
    ap.add_argument("--tris", type=int, default=1000000)
    ap.add_argument("--cand", type=int, default=64)
    ap.add_argument("--cs", type=int, default=128)
    ap.add_argument("--rt", type=int, default=512)
    ap.add_argument("--st", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as benchmod
    from rts_tpu.engine.animate import animate_packed
    from rts_tpu.engine.fan import generate_fan
    from rts_tpu.ops.cluster_trace import _tile_candidates

    bargs = argparse.Namespace(
        tris=args.tris, rays=args.rays, pulses=2, repeat=1, tri_chunk=2048,
        scene="terrain", accel="cluster", cluster_size=args.cs,
        ray_tile=args.rt, candidates=args.cand, sub_tiles=args.st,
        mt_group=8, mt_union=True, cand_order="near", fan_order="raster",
        refine=False, replay_cap=0, p1_fanout=8, p1_super_k=12,
    )
    base, batch, cfg, spec, n_tris = benchmod.build(bargs)
    sc = animate_packed(base, batch.rot[0], batch.pos[0], batch.vel[0], args.cs)
    fan = np.asarray(
        generate_fan(cfg.num_rays, (batch.tx_dir[0, 0], batch.tx_dir[0, 1]),
                     spec.kwargs()["tx_span"]), np.float32,
    )
    n_rays = fan.shape[0]
    origin = np.broadcast_to(np.asarray(batch.tx_origin[0], np.float32), fan.shape).copy()
    tmin = np.full((n_rays,), 0.005, np.float32)
    mn = np.asarray(sc.aabb_mn, np.float32)
    mx = np.asarray(sc.aabb_mx, np.float32)
    print(f"# {n_tris} tris, {n_rays} rays, {mn.shape[0]} clusters (cs={args.cs})")

    lp = -(-n_rays // args.rt) * args.rt
    o = np.concatenate([origin, np.zeros((lp - n_rays, 3), np.float32)])
    d = np.concatenate([fan, np.zeros((lp - n_rays, 3), np.float32)])
    tm = np.concatenate([tmin, np.full((lp - n_rays,), 0.005, np.float32)])

    cand, meta, _bits = (
        np.asarray(x) for x in _tile_candidates(
            jnp.asarray(o.T), jnp.asarray(d.T), jnp.asarray(tm),
            jnp.asarray(mn), jnp.asarray(mx), args.rt, args.st, args.cand,
            p1_fanout=8, p1_super_k=12,
        )
    )
    tiles = lp // args.rt
    ot = o.reshape(tiles, args.rt, 3)
    dt = d.reshape(tiles, args.rt, 3)
    tmt = tm.reshape(tiles, args.rt)
    cmn = mn[np.minimum(cand, mn.shape[0] - 1)]
    cmx = mx[np.minimum(cand, mn.shape[0] - 1)]
    kslot = np.arange(args.cand)[None, :]
    invalid = kslot >= meta[:, 0:1]
    cmn = np.where(invalid[:, :, None], np.inf, cmn)
    cmx = np.where(invalid[:, :, None], -np.inf, cmx)
    ov, _tnear = slab_np(ot, dt, tmt, cmn, cmx)  # [T, R, K]
    n_cand = meta[:, 0]
    print(f"primary: cand/tile mean {n_cand.mean():.1f}, "
          f"per-ray true overlap {ov.sum(axis=2).mean():.2f} clusters")

    cs = args.cs
    rs = args.rt // args.st

    # ---- CURRENT kernel (G=8 union, padded windows) — HW accounting
    bits = ov.reshape(tiles, args.st, rs, args.cand).any(axis=2)  # [T,B,K]
    validk = kslot < n_cand[:, None]
    bits = bits & validk[:, None, :]
    g = 8
    nwin = (args.cand + g - 1) // g
    win = np.pad(bits, ((0, 0), (0, 0), (0, nwin * g - args.cand))).reshape(
        tiles, args.st, nwin, g)
    union_gate = win.any(axis=3)
    hw_pairs = union_gate.sum() * g * rs * cs / n_rays
    cur_events = union_gate.sum() + np.ceil(n_cand / g).sum()
    print("\nper-segment model (63^3 primary; bounce-1 is ~0.9x of this):")
    cur = variant_report("CURRENT G=8 union window", hw_pairs,
                         tiles * args.rt, cur_events,
                         note="(calibration anchor: measured 8.9 ms live)")

    # ---- per-cand gate (mt_union=False bound, for reference)
    pc_pairs = bits.sum() * rs * cs / n_rays
    variant_report("per-cand gate (G=1 windows)", pc_pairs,
                   tiles * args.rt, bits.sum(),
                   note="(measured SLOWER on HW: r3 mt_union=False)")

    # ---- variant B: sub-block queue at 128-ray lane-aligned granularity
    # items = gated (tile-quarter, cluster) pairs; rows stay in fan order
    # (no gather), each item is one [128, cs] window.
    q = args.rt // 128
    bits128 = ov.reshape(tiles, q, 128, args.cand).any(axis=2) & validk[:, None, :]
    b_pairs = bits128.sum() * 128 * cs / n_rays
    # rows processed: each gated item re-reads its 128 rays
    b_rows = bits128.sum() * 128
    variant_report("B: 128-row item queue (no gather)", b_pairs, b_rows,
                   bits128.sum(),
                   note="(items batchable per cluster; events = items)")

    # ---- variant A: per-ray exact queue (pairs sorted by cluster)
    # per-cluster ray counts, then 64-row block padding
    pair_t, pair_r, pair_k = np.nonzero(ov & validk[:, None, :])
    pair_cluster = cand[pair_t, pair_k]
    n_pairs = pair_cluster.size
    counts = np.bincount(pair_cluster, minlength=mn.shape[0])
    live_clusters = int((counts > 0).sum())
    for block in (64, 128, 512):
        padded = (np.ceil(counts / block) * block).sum()
        a_pairs = padded * cs / n_rays
        # events: one window per cluster block of `block` rows, one DMA per
        # cluster; sub-block branches at 64-row granularity inside
        a_events = np.ceil(counts / block).sum() + live_clusters + padded / 64
        # build cost lower bound: 3M-pair sort is the blocker — XLA sort of
        # n keys ~ log2(n)^2 bitonic stages; at the VPU's ~1e11 elem-ops/s
        sort_ms = n_pairs * np.log2(max(n_pairs, 2)) ** 2 / 1e11 * 1e3
        gather_ms = n_pairs * (8 + 8) * 4 * 2 / 819e9 * 1e3  # pair rows in+out, HBM
        variant_report(
            f"A: per-ray queue, {block}-row blocks", a_pairs, padded, a_events,
            extra_ms=sort_ms + gather_ms,
            note=f"({n_pairs} pairs, {live_clusters} live clusters; "
                 f"sort>={sort_ms:.1f} gather>={gather_ms:.2f} ms)")

    # ---- exact floor for reference
    floor = ov.sum() * cs / n_rays
    print(f"\n  exact per-ray floor at cs={cs}: {floor:.0f} pairs/ray "
          f"(MT-only {MT_MS_PER_SEG * floor / HW_PAIRS_CURRENT:.2f} ms/seg)")
    print(f"  current measured live kernel: 8.9 ms/seg; anchor model: "
          f"{cur[0]:.2f}-{cur[1]:.2f}")
    print("\nGO only if a variant's HIGH estimate beats the current anchor's "
          "LOW estimate by >20% (the build cost of a new kernel family).")


if __name__ == "__main__":
    main()
