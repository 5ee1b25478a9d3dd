"""Offline model: does in-tile ray reordering cut gated MT work?

The phase-2 kernel gates each (64-row ray block, G-candidate window) on
the union of the candidates' phase-1 overlap bits.  Rays arrive in
raster fan order, so a candidate needed by ~20 rays of a tile still
gates (and fully evaluates) every 64-row block those rays are scattered
over.  Hypothesis (CLAUDE.md round-4 roadmap #1): sorting rays WITHIN
each tile by their nearest overlapping candidate concentrates each
candidate's rays into few blocks, cutting gated blocks — candidate
lists, tile membership and phase-1 cost are unchanged, and closest-hit
is per-ray independent, so results are a permutation (bit-identical
after inverse-permute).

This script MEASURES the cut on the real bench geometry (1M-tri
terrain + calibration plate, 63^3 fan) without building the kernel
change: it recomputes per-ray candidate overlap host-side, then counts
gated (block, window) evaluations for raster vs sorted order, for
G=1/2/4, union and per-candidate gating, for the primary segment and a
mirror-reflection bounce segment.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/model_reorder.py [--rays 63]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

BIG = 3.0e38


def slab_np(o, d, tmin, mn, mx):
    """Exact per-ray slab vs per-tile candidate boxes, NumPy mirror of
    ops/cluster_trace._slab_overlap (no running-best term).

    o, d: [T, R, 3]; tmin: [T, R]; mn, mx: [T, K, 3]
    returns overlap [T, R, K] bool, tnear [T, R, K] (inf where no overlap)
    """
    safe_d = np.where(d == 0.0, 1.0, d)
    inv = 1.0 / safe_d
    t1 = (mn[:, None, :, :] - o[:, :, None, :]) * inv[:, :, None, :]
    t2 = (mx[:, None, :, :] - o[:, :, None, :]) * inv[:, :, None, :]
    lo = np.minimum(t1, t2)
    hi = np.maximum(t1, t2)
    inside = (o[:, :, None, :] >= mn[:, None, :, :]) & (o[:, :, None, :] <= mx[:, None, :, :])
    dz = d[:, :, None, :] == 0.0
    lo = np.where(dz, np.where(inside, -BIG, BIG), lo)
    hi = np.where(dz, np.where(inside, BIG, -BIG), hi)
    tn = lo.max(axis=3)
    tf = hi.min(axis=3)
    alive = (d * d).sum(axis=2) > 0.0
    ok = np.isfinite(mn).all(axis=2) & np.isfinite(mx).all(axis=2) & (mn <= mx).all(axis=2)
    ov = (tf >= tn) & (tf >= tmin[:, :, None]) & alive[:, :, None] & ok[:, None, :]
    return ov, np.where(ov, np.maximum(tn, 0.0), np.inf)


def cand_order_mask(ov, tnear, n_cand, sub_tiles):
    """Candidate permutation grouping similar block masks.

    Sort key = (block bitmask as integer, tile-min tnear): candidates
    whose rays live in the same 64-row blocks become window-mates, so a
    G-window's union mask ~= each member's own mask and union gating
    stops inflating work.  Returns perm [T, K] (invalid slots last).
    """
    t, r, k = ov.shape
    rs = r // sub_tiles
    bits = ov.reshape(t, sub_tiles, rs, k).any(axis=2)  # [T, B, K]
    mask_int = (bits.astype(np.int64) << np.arange(sub_tiles)[None, :, None]).sum(axis=1)
    tmin_c = np.where(ov, tnear, np.inf).min(axis=1)  # [T, K] tile-min entry
    valid = np.arange(k)[None, :] < n_cand[:, None]
    # lexicographic: valid first, then mask pattern, then near-to-far
    key = (~valid).astype(np.int64) * (1 << 40) + mask_int * (1 << 20)
    key = key + np.minimum(np.nan_to_num(tmin_c, posinf=1e6), 1e6).astype(np.int64)
    return np.argsort(key, axis=1, kind="stable")


def cand_order_greedy(ov, tnear, n_cand, sub_tiles, g):
    """Window-aware greedy: each window starts at the nearest unplaced
    candidate, then appends the candidate whose mask adds fewest new
    blocks to the window union (ties: nearest first)."""
    t, r, k = ov.shape
    rs = r // sub_tiles
    bits = ov.reshape(t, sub_tiles, rs, k).any(axis=2)  # [T, B, K]
    tmin_c = np.where(ov, tnear, np.inf).min(axis=1)
    perm = np.zeros((t, k), np.int64)
    for ti in range(t):
        n = int(n_cand[ti])
        rest = list(range(n))
        out = []
        while rest:
            # nearest remaining seeds the window
            seed = min(rest, key=lambda q: tmin_c[ti, q])
            rest.remove(seed)
            out.append(seed)
            u = bits[ti, :, seed].copy()
            while len(out) % g and rest:
                nxt = min(rest, key=lambda q: ((~u & bits[ti, :, q]).sum(), tmin_c[ti, q]))
                rest.remove(nxt)
                out.append(nxt)
                u |= bits[ti, :, nxt]
        out.extend(range(n, k))
        perm[ti] = np.asarray(out)
    return perm


def gate_counts(ov, n_cand, sub_tiles, groups=(1, 2, 4)):
    """Count gated evaluations from a per-ray overlap tensor.

    ov: [T, R, K] bool (K = candidate width, candidates near-to-far),
    n_cand: [T] valid candidate count per tile.
    Returns {(G, union): evaluated pairs} with pair = 1 ray x 1 triangle
    column (x cluster_size columns applied by the caller).
    """
    t, r, k = ov.shape
    rs = r // sub_tiles
    # block bit per (tile, block, candidate)
    bits = ov.reshape(t, sub_tiles, rs, k).any(axis=2)  # [T, B, K]
    valid = np.arange(k)[None, :] < n_cand[:, None]  # [T, K]
    bits = bits & valid[:, None, :]
    out = {}
    for g in groups:
        nwin = (k + g - 1) // g
        pad = nwin * g - k
        bp = np.pad(bits, ((0, 0), (0, 0), (0, pad)))
        win = bp.reshape(t, sub_tiles, nwin, g)
        union_gate = win.any(axis=3)  # [T, B, W]
        # union window evaluates g*cs columns x rs rows when gated; tail
        # windows (candidates beyond n_cand) contribute via `valid` zeroing
        # full-window accounting: count valid candidates in each window
        vwin = np.pad(valid, ((0, 0), (0, pad))).reshape(t, 1, nwin, g).sum(axis=3)
        out[(g, True)] = float((union_gate * vwin).sum() * rs)  # pairs / cs
        out[(g, False)] = float(win.sum() * rs)
        # HARDWARE cost: a gated window always evaluates its full g*cs
        # columns (padding slots repeat the last candidate), plus count
        # the scalar-serialised per-window fixed events (DMA waits are
        # per-candidate-slot, branches/epilogues per gated sub-block)
        gated_w = float(union_gate.sum())
        out[(g, "hw")] = gated_w * g * rs
        out[(g, "windows")] = float((np.ceil(n_cand / g)).sum())
        out[(g, "gated_evals")] = gated_w
    return out


def fmt(pairs, n_rays, cs, label):
    per_ray = pairs * cs / n_rays
    print(f"  {label:42s} {per_ray:9.0f} pairs/ray")
    return per_ray


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=63)
    ap.add_argument("--tris", type=int, default=1000000)
    ap.add_argument("--cand", type=int, default=64)
    ap.add_argument("--cs", type=int, default=256)
    ap.add_argument("--rt", type=int, default=512)
    ap.add_argument("--st", type=int, default=8)
    ap.add_argument("--p1-fanout", type=int, default=None)
    ap.add_argument("--p1-super-k", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=1, help="bounce segments to model")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench as benchmod
    from rts_tpu.engine.animate import animate_packed
    from rts_tpu.engine.fan import generate_fan
    from rts_tpu.ops.cluster_trace import _tile_candidates

    bargs = argparse.Namespace(
        tris=args.tris, rays=args.rays, pulses=2, repeat=1, tri_chunk=2048,
        scene="terrain", accel="cluster", cluster_size=args.cs,
        ray_tile=args.rt, candidates=args.cand, sub_tiles=args.st,
        mt_group=4, mt_union=True, cand_order="near", fan_order="raster", refine=False,
        replay_cap=0,
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
    pack = np.asarray(sc.tri_pack, np.float32)
    print(f"# {n_tris} tris, {n_rays} rays, {mn.shape[0]} clusters (cs={args.cs})")

    def pad_tiles(a, fill=0.0):
        l = a.shape[0]
        lp = -(-l // args.rt) * args.rt
        if lp > l:
            a = np.concatenate([a, np.full((lp - l,) + a.shape[1:], fill, a.dtype)])
        return a

    def segment_model(o, d, tm, name):
        o, d, tm = pad_tiles(o), pad_tiles(d), pad_tiles(tm)
        cand, meta, _bits = (
            np.asarray(x) for x in _tile_candidates(
                # lanes-last engine layout: [3, l] components-major
                jnp.asarray(o.T), jnp.asarray(d.T), jnp.asarray(tm),
                jnp.asarray(mn), jnp.asarray(mx), args.rt, args.st, args.cand,
                p1_fanout=args.p1_fanout, p1_super_k=args.p1_super_k,
            )
        )
        tiles = o.shape[0] // args.rt
        ot = o.reshape(tiles, args.rt, 3)
        dt = d.reshape(tiles, args.rt, 3)
        tmt = tm.reshape(tiles, args.rt)
        cmn = mn[np.minimum(cand, mn.shape[0] - 1)]
        cmx = mx[np.minimum(cand, mn.shape[0] - 1)]
        # mark invalid candidate slots as never-overlapping
        kslot = np.arange(args.cand)[None, :]
        invalid = kslot >= meta[:, 0:1]
        cmn = np.where(invalid[:, :, None], np.inf, cmn)
        cmx = np.where(invalid[:, :, None], -np.inf, cmx)
        ov, tnear = slab_np(ot, dt, tmt, cmn, cmx)  # [T, R, K]
        n_cand = meta[:, 0]
        print(f"{name}: cand/tile mean {n_cand.mean():.1f}, overflow {meta[:, 1].sum()} tiles, "
              f"per-ray true overlap {ov.sum(axis=2).mean():.2f} clusters")

        groups = (1, 2, 4, 8, 16)
        base_counts = gate_counts(ov, n_cand, args.st, groups)
        # candidate-order variants: mask-similarity sort; window-aware greedy
        pm = cand_order_mask(ov, tnear, n_cand, args.st)
        ov_m = np.take_along_axis(ov, pm[:, None, :], axis=2)
        mask_counts = gate_counts(ov_m, n_cand, args.st, groups)
        print(f"  {'variant':42s} {'work':>9s}")
        ref = fmt(base_counts[(4, True)], n_rays, args.cs, "near-to-far G=4 union (CURRENT)")
        fmt(base_counts[(1, True)], n_rays, args.cs, "per-cand floor (any order, G irrelevant)")
        for g in groups[1:]:
            fmt(base_counts[(g, True)], n_rays, args.cs, f"near-to-far G={g} union")
        for g in groups[1:]:
            hw = base_counts[(g, "hw")] * args.cs / n_rays
            print(
                f"  {'HW cols G=%d (padded windows)' % g:42s} {hw:9.0f} pairs/ray"
                f"  ({base_counts[(g, 'windows')] / (n_rays / args.rt):.2f} win/tile,"
                f" {base_counts[(g, 'gated_evals')] / (n_rays / args.rt):.1f} gated evals/tile)"
            )
        for g in groups[1:]:
            fmt(mask_counts[(g, True)], n_rays, args.cs, f"mask-sorted G={g} union")
        for g in (4, 8):
            pg = cand_order_greedy(ov, tnear, n_cand, args.st, g)
            ov_g = np.take_along_axis(ov, pg[:, None, :], axis=2)
            gc = gate_counts(ov_g, n_cand, args.st, (g,))
            fmt(gc[(g, True)], n_rays, args.cs, f"greedy G={g} union")
        floor = ov.sum() * args.cs / n_rays
        print(f"  {'exact per-ray floor':42s} {floor:9.0f} pairs/ray")
        return ov, tnear, cand, meta, ot, dt, tmt

    # ---- primary segment
    ov, tnear, cand, meta, ot, dt, tmt = segment_model(origin, fan, tmin, "primary")

    def bounce_from(ot, dt, tmt, cand, meta):
        """Mirror-reflect at the nearest-candidate hit.  Host-side closest
        hit over each tile's candidate clusters (matches kernel semantics
        for non-overflow tiles; good enough for the model)."""
        tiles = ot.shape[0]
        best_t = np.full((tiles, args.rt), np.inf, np.float32)
        best_n = np.zeros((tiles, args.rt, 3), np.float32)
        for ti in range(tiles):
            k = int(meta[ti, 0])
            if k == 0:
                continue
            cols = []
            for q in range(k):
                c = int(cand[ti, q])
                cols.append(pack[:, c * args.cs:(c + 1) * args.cs])
            p = np.concatenate(cols, axis=1)  # [16, k*cs]
            o_, d_ = ot[ti], dt[ti]
            m = np.cross(d_, o_)
            n_t, c1_t, c0_t = p[0:3], p[3:6], p[6:9]
            e1_t, e0_t, np0 = p[9:12], p[12:15], p[15]
            denom = d_ @ n_t
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / denom
                tt = (np0[None, :] - o_ @ n_t) * inv
                beta = (d_ @ c1_t - m @ e1_t) * inv
                gamma = (d_ @ c0_t - m @ e0_t) * inv
            valid = (tt > tmt[ti][:, None]) & (tt < BIG) & (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1.0)
            tm_ = np.where(valid, tt, np.inf)
            j = np.argmin(tm_, axis=1)
            rows = np.arange(args.rt)
            tj = tm_[rows, j]
            best_t[ti] = tj
            best_n[ti] = n_t[:, j].T
        hit = np.isfinite(best_t)
        nrm = best_n / np.maximum(np.linalg.norm(best_n, axis=2, keepdims=True), 1e-30)
        d2 = dt - 2.0 * (dt * nrm).sum(axis=2, keepdims=True) * nrm
        o2 = ot + best_t[:, :, None] * dt
        o2 = np.where(hit[:, :, None], o2, 0.0)
        d2 = np.where(hit[:, :, None], d2, 0.0)  # dead lanes: d=0 (matches engine)
        print(f"bounce: {hit.mean() * 100:.1f}% of lanes alive")
        return o2, d2

    for b in range(args.bounces):
        o2, d2 = bounce_from(ot, dt, tmt, cand, meta)
        ov, tnear, cand, meta, ot, dt, tmt = segment_model(
            o2.reshape(-1, 3), d2.reshape(-1, 3),
            np.full((o2.shape[0] * args.rt,), 5e-3, np.float32), f"bounce-{b + 1}",
        )


if __name__ == "__main__":
    main()
