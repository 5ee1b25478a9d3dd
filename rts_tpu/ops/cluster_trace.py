"""Pallas TPU kernel: clustered closest-hit traversal.

The TPU-native replacement for OptiX's hardware BVH traversal
(ray_tracer.cu:243 rtTrace).  Triangles arrive Morton-clustered
(rts_tpu.accel) in a packed [16, T] field layout (triangles on the lane
axis; rows = n, c1, c0, e1, e0, np0); rays are processed in tiles of
``ray_tile``.

Traversal is two-phase (the log-depth analogue for a vector machine —
in-kernel scalar branching, not arithmetic, is what bounds a flat sweep):

  PHASE 1 (plain XLA, fully vectorised, once per wavefront segment):
  build a per-ray-tile CANDIDATE CLUSTER LIST with the kernel's own
  EXACT per-ray slab test, evaluated hierarchically (rays x supergroup
  boxes, then member clusters of overlapping supergroups) and OR-reduced
  over each tile's rays; near-to-far top_k selection.  See
  ``_tile_candidates`` for why a frustum interval test was rejected.
  Tiles overlapping more clusters than the list holds are flagged for
  the in-kernel fallback sweep.

  PHASE 2 (this kernel, one grid step per ray tile): loop over ONLY the
  tile's candidates, ``mt_group`` per loop step as one full-width
  [rows, G*cs] union-gated MT window (lists are phase-1 padded to a
  multiple of G, so there is no narrow tail path), with a deep DMA
  prefetch pipeline (every candidate is a real overlap, so fetches are
  unconditional and the ~us per-copy latency is hidden).  The MT test
  runs per ray sub-block, each gated by the OR of the window's phase-1
  overlap bits (candidate mode — no in-kernel slab or running-best
  prune on the MT; sweep mode keeps both), as broadcast-sum K=3
  contractions (VPU work — see engine/intersect.py).
  Flagged overflow tiles instead walk the full supergroup/group/cluster
  hierarchy (the pre-candidate design, kept as the always-correct path).

Sequential in-kernel iterations per tile drop from
O(groups + visited*group_size) slab/branch steps (~150 at 1M tris, each
~0.8 us of scalar-serialised latency) to O(candidates) (~10), which
moved the kernel from loop-overhead-bound to VPU-flops-bound (7.5 ->
~3 ms/segment at 1M tris; docs/PERF.md has the ledger).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rts_tpu.engine.intersect import RT_DEFAULT_MAX, HitResult

_BIG = 3.0e38  # plain float: jnp scalars would become captured kernel consts

# Phase-1 hierarchy: level 1 tests rays against supergroup boxes (runs of
# _P1_FANOUT consecutive clusters); level 2 expands at most _P1_SUPER_K
# overlapping supergroups per tile to exact per-cluster tests.  Keeps
# phase 1 O(rays x C/fanout + tiles x rays x K*fanout) instead of
# O(rays x C) — flat at any cluster_size.  Defaults; overridable per
# call (TraceConfig.p1_fanout / p1_super_k): the bench terrain admits
# only ~6.2 supergroups per tile (max 11), so smaller K cuts level-2
# filler slots — tiles whose admission exceeds K overflow to the
# kernel's full hierarchical sweep, keeping correctness unconditional.
_P1_FANOUT = 16
_P1_SUPER_K = 16

# Level 0 kicks in when the supergroup count S reaches _P1_L0_MIN_S
# (the dense [rays, S] level-1 pass dominated phase 1 at S=489 —
# profile_phase1.py): runs of _P1_FANOUT0 supergroups are tested dense
# ([rays, S/f0]), then only admitted runs' members per tile.  K0 caps
# admitted runs per tile (overflow -> kernel sweep fallback; the bench
# terrain admits ~2-4 level-0 boxes per tile).
_P1_FANOUT0 = 8
_P1_SUPER_K0 = 12
_P1_L0_MIN_S = 192

# Experiment knob (scripts/profile_p1sel.py): bit 0 = int-bitcast top_k
# key in the final candidate selection (order-identical to the f32 key:
# non-negative f32 bit patterns sort like values, ties keep index order
# in both), bit 1 = lax.optimization_barrier on the [tiles, st, kf]
# partials.  Measured (r3o, 63³ production config): the barrier saves
# 0.64 ms/pulse-segment — WITHOUT it the top_k/sort fusion boundary
# duplicates the [tiles, rt, kf] l2 slab chain into several consumer
# fusions; the int key is a small loss (7.29 vs 6.96).  Default = 2.
_P1_SEL_MODE = 2

# Rays-on-LANES slab orientation (RTS_P1_RL): the classic layout puts the
# box list on the minor (lane) axis — 62- or 96-wide lists pad to the
# 128-lane tile, so every op of the big slab chains pays 1.33-2x — while
# the ray count (a 512 multiple) sits on sublanes.  RL mode flips each
# chain ([S0, l] / [tiles, B, rt]) so lanes are rays (zero padding) and
# boxes ride sublanes; any/min reductions are exact either way, so the
# emitted lists are BIT-identical.  See docs/PERF.md r4.
# (defined below, after the _os import)


# SMEM byte budget for the per-tile candidate/meta lists; grids with more
# tiles than fit are chunked into independent pallas_calls (measured
# 2.06e6 vs 1.66e6 rays/s chunked at a 63^3 fan — chunks re-pay pipeline
# warm-up, so one call is strongly preferred).  The chip has 1 MB of
# SMEM and rows are lane-padded to 512 B (_pack_smem_rows); 512 KB of
# row-packed lists covers a 63^3 fan at cand=64 (~264 KB) or cand=128
# (~508 KB) while leaving headroom for the visit orders and register
# spills.  Env override for hardware experiments (bytes).
import os as _os

_SMEM_LIST_BUDGET = int(_os.environ.get("RTS_SMEM_LIST_BUDGET", 512 * 1024))

_P1_RL = _os.environ.get("RTS_P1_RL", "0") == "1"

# Kernel cost-model calibration switches (hardware experiments only;
# both are value-identical to the default path — see docs/PERF.md r3k):
# UNGATED skips the per-sub-block pl.when gate in candidate mode (every
# window evaluates all sub-blocks: trades ~2% more VPU flops at the
# production config for ~10 fewer scalar branches per tile — measures
# whether the kernel is branch-event-bound or VPU-issue-bound).
# THIN_VALID drops the redundant (t < RT_DEFAULT_MAX) test (a t >= MAX
# winner still reports found=False downstream) and folds the two
# barycentric sign tests through one minimum — 3 fewer full-width VPU
# ops of ~50.  Measured +3.3% end-to-end (4.40 -> 4.55e6 rays/s at the
# 63³ narrow32 bench, received masks identical) and DEFAULT ON; the
# r3k calibration also showed UNGATED at +1.2% alone but a LOSS on top
# of THIN_VALID (its ~2% extra flops outweigh the freed branches once
# ops are thinner), so gating stays.  Verdict: the candidate kernel is
# VPU-instruction-issue bound — scalar events (branches, DMA waits)
# are ~0.1 us, not the ~1 us the round-2 model assumed.
_KERNEL_UNGATED = _os.environ.get("RTS_KERNEL_UNGATED", "0") == "1"
_KERNEL_THIN_VALID = _os.environ.get("RTS_KERNEL_THIN_VALID", "1") == "1"
# FLOOR is a bisect mask for the ~6 us/tile dead-input kernel floor
# (docs/PERF.md r3m: scales with rows, ~12 ns/ray, NOT per-grid-step).
# Each bit DELETES a kernel stage — output values become garbage, so
# this is timing-only (scripts/profile_kfloor.py):
#   bit 0: replace the hoisted per-tile component math (o/d slices +
#          d x o cross) with vreg constants
#   bit 1: skip the t/i/b/g output init fills
#   bit 2: skip the stats_out tail write
#   bit 3: skip the candidate/sweep dispatch entirely (loops + drain)
_KERNEL_FLOOR = int(_os.environ.get("RTS_KERNEL_FLOOR", "0"))
# A stray RTS_KERNEL_FLOOR in the environment would silently corrupt
# every trace — require an explicit confirmation variable so the bisect
# scripts (which set the module attribute in-process, or export both
# vars) keep working while accidental inheritance fails loudly.
if _KERNEL_FLOOR and _os.environ.get("RTS_TIMING_GARBAGE_OK") != "1":
    raise RuntimeError(
        "RTS_KERNEL_FLOOR deletes kernel stages — outputs are garbage "
        "by design (timing bisect only, scripts/profile_kfloor.py). "
        "Set RTS_TIMING_GARBAGE_OK=1 to confirm, or unset it."
    )
# PACKED_IO: marshal the per-ray kernel I/O through lane-major packs.
# The legacy layout fed o/d as [lp, 3], tmin as [lp, 1] and wrote four
# [lp, 1] outputs — every one of those blocks pads its minor dim to the
# 128-lane tile, so each 512-ray grid step DMA'd ~1.8 MB where ~20 KB is
# logical.  The r3q dead-floor bisect (scripts/profile_kfloor.py) proved
# the whole ~6 us/tile row floor IS this pipeline traffic: deleting the
# entire kernel body (mask 15) moved nothing.  Packed mode feeds ONE
# [8, lp] input (rows o0,o1,o2,d0,d1,d2,tmin,pad), accumulates the
# running best in a [rt, 8] VMEM scratch, and writes ONE [8, lp] output
# (rows t,tri,beta,gamma as f32; tri ids are exact in f32 below 2^24) —
# 16 KB per grid step and 2 block copies instead of 7.  In-kernel
# (8,rt)<->(rt,8) transposes bridge to the rays-on-sublanes MT layout.
_PACKED_IO = _os.environ.get("RTS_KERNEL_PACKED_IO", "1") == "1"
# emit_shade epilogue variant: extract the winner's shade fields only
# when the window improved some row (scalar any() sync per eval, saves
# the 10 masked sums on non-improving windows).  Value-identical: the
# shade RMW is where(better, ...) anyway.  r5 A/B flag.
_SHADE_EMIT_GATED = _os.environ.get("RTS_SHADE_EMIT_GATED", "0") == "1"

# Experiment-flag audit: every env switch above with its default, so the
# production preset can warn when any is inherited from a stale shell
# (prepare_cpi, sim/cpi.py).  All non-FLOOR flags are value-identical by
# design, but non-default settings still change timing silently.
_EXPERIMENT_FLAG_DEFAULTS = {
    "RTS_SMEM_LIST_BUDGET": str(512 * 1024),
    "RTS_P1_RL": "0",
    "RTS_KERNEL_UNGATED": "0",
    "RTS_KERNEL_THIN_VALID": "1",
    "RTS_KERNEL_FLOOR": "0",
    "RTS_KERNEL_PACKED_IO": "1",
    "RTS_SHADE_EMIT_GATED": "0",
}


def nondefault_experiment_flags() -> dict:
    """Env experiment switches currently set away from their defaults.

    Values are compared SEMANTICALLY (int() for numeric flags, == "1"
    for booleans — the same parses the actual reads above use), so a
    different spelling of a default (e.g. ``RTS_SMEM_LIST_BUDGET=' 524288'``)
    does not raise a spurious production-preset warning; unparseable
    values are always reported."""
    numeric = {"RTS_SMEM_LIST_BUDGET", "RTS_KERNEL_FLOOR"}
    out = {}
    for k, d in _EXPERIMENT_FLAG_DEFAULTS.items():
        raw = _os.environ.get(k, d)
        if k in numeric:
            try:
                differs = int(raw) != int(d)
            except ValueError:
                differs = True
        else:
            # boolean flags are read as (value == "1") — mirror that
            differs = (raw == "1") != (d == "1")
        if differs:
            out[k] = raw
    return out


def _dma_depth(k_max: int, mt_group: int = 2) -> int:
    """Cluster-DMA pipeline depth: deep prefetch in candidate mode (hides
    the ~us per-copy latency), classic double-buffer for the sweep.
    Always a multiple of ``mt_group`` so a group's (aligned slot ..
    slot+G-1) window is contiguous and never wraps the circular scratch."""
    if k_max <= 0:
        return 2
    g = max(1, mt_group)
    # at least TWO G-windows of scratch, else the next window's copies
    # can only start after the current one processes (no overlap at g=8)
    d = max(2, min(8, k_max), 2 * g if g > 1 else g)
    return -(-d // g) * g


def _slab_overlap(o, d, tmin, best, mn, mx):
    """Rays [RT,3] vs one AABB (mn/mx [3]).  Robust to d==0 axes.

    Padding sentinel boxes must be [+inf, +inf], NOT inverted
    [+BIG, -BIG]: the min/max(t1, t2) below silently un-inverts a
    reversed box (any all-nonzero-direction ray would "overlap" it and
    march padding clusters into the DMA stage with out-of-bounds bases),
    while the infinite box self-rejects through the existing terms —
    tn = tf = +/-inf fails (tn <= best) or (tf >= tmin) for every ray —
    at zero extra per-slab cost (measured: an explicit validity term
    here cost ~30% of kernel throughput).
    """
    safe_d = jnp.where(d == 0.0, 1.0, d)
    inv = 1.0 / safe_d
    t1 = (mn[None, :] - o) * inv
    t2 = (mx[None, :] - o) * inv
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    inside = (o >= mn[None, :]) & (o <= mx[None, :])
    # d==0: the axis constrains nothing if o is inside the slab, else kills.
    lo = jnp.where(d == 0.0, jnp.where(inside, -_BIG, _BIG), lo)
    hi = jnp.where(d == 0.0, jnp.where(inside, _BIG, -_BIG), hi)
    tn = jnp.max(lo, axis=1)
    tf = jnp.min(hi, axis=1)
    alive = jnp.sum(d * d, axis=1) > 0.0
    return (tf >= tn) & (tf >= tmin) & (tn <= best) & alive


def _mt_kernel(
    *refs,
    # Ref layout (positional; shared middle block in both modes):
    #   packed_io=True:
    #     rays_ref [8, RT] VMEM (rows o0,o1,o2,d0,d1,d2,tmin,pad),
    #     <shared>, out_ref [8, RT] VMEM f32 (rows t,tri,b,g — tri ids
    #     are exact in f32 below 2^24), stats_out,
    #     best_s [RT, 8] VMEM f32 scratch (running best t/tri/b/g),
    #     pack_s, counters, sem
    #   packed_io=False (legacy layout, RTS_KERNEL_PACKED_IO=0):
    #     o_ref [RT, 3], d_ref [RT, 3], tmin_ref [RT, 1],
    #     <shared>, t_out/i_out/b_out/g_out [RT, 1], stats_out,
    #     pack_s, counters, sem
    # <shared> =
    #   mn_ref/mx_ref [Cp, 3] VMEM cluster bounds (padded to group_size),
    #   gmn_ref/gmx_ref [G, 3] VMEM supercluster bounds,
    #   smn_ref/smx_ref [S, 3] VMEM super²-cluster bounds,
    #   sorder_ref SMEM int32 ROW-PACKED [ceil(S/128), 128] — supergroup
    #     visit order (near-to-far); entry i at [i//128, i%128],
    #   gorder_ref SMEM int32 row-packed like sorder — group visit order,
    #     near-to-far WITHIN each supergroup (slot sg*super_size+j holds
    #     the j-th nearest group of supergroup sg),
    #   cand_ref SMEM int32 [ceil(tiles/tpr), tpr*K] — per-tile candidate
    #     clusters, near-to-far; tile t's slot i lives at
    #     [t//tpr, (t%tpr)*K + i] with tpr = max(1, 128//K).  SMEM rows
    #     are lane-padded to 128 int32 (512 B) no matter the declared
    #     width, so narrow per-tile rows would waste ~4x the 1 MB SMEM,
    #   meta_ref SMEM int32 [ceil(tiles/64), 128] — per-tile (candidate
    #     count, overflow flag) at [t//64, (t%64)*2 + 0/1],
    #   bits_ref SMEM int32 packed like cand_ref — per-candidate
    #     sub-block overlap bitmask,
    #   pack_hbm [16, T] ANY: rows 0-2 n, 3-5 c1, 6-8 c0, 9-11 e1,
    #     12-14 e0, 15 np0
    # pack_s = [16, nbuf*CS] VMEM scratch (DMA pipeline), counters =
    # SMEM (2,) int32, sem = DMA semaphores (nbuf,).
    packed_io: bool,
    num_clusters: int,  # padded count Cp
    cluster_size: int,
    group_size: int,
    super_size: int,  # groups per supergroup (3rd culling level)
    sub_tiles: int,
    k_max: int,  # candidate-list width; 0 = always use the hierarchical sweep
    mt_group: int,  # candidates per MT evaluation window (1/2/4/8/16/32)
    mt_union: bool,  # True: one G*cs-wide union-gated evaluation per step;
    #                  False: G-unrolled loop, each candidate evaluated in
    #                  its own cs-wide window with its own bits (no union
    #                  waste, more branches/epilogues)
    mt_tail: bool,  # True (with mt_union): pad lists to g/2 and evaluate
    #                 one half-width window when the remainder fits —
    #                 trims the padded-duplicate columns of the last window
    resident: bool = False,  # candidate windows copy from a VMEM-resident
    #                 live-cluster pack (cand_ref holds LIVE SLOT ids;
    #                 live_tab recovers global ids for the tri epilogue);
    #                 the sweep fallback keeps the HBM pack + pipeline
    emit_shade: bool = False,  # pack has 32 rows (16-25 = shade fields:
    #                 base corner normals x9 + target-as-float); the
    #                 one-hot argmin epilogue also extracts the winner's
    #                 10 shade values (exact — one column is hot) into
    #                 ten extra running-best scratches, and the packed
    #                 output grows to [16, RT] (rows 4-13 = shade).
    #                 Replaces the XLA [T, 10] row gather in the hit
    #                 body (docs/PERF.md r4e: 3.03 ms/pulse, address-
    #                 generation-bound).  packed_io only.
    mt_prune: bool = False,  # candidate-mode running-best prune: skip a
    #                 sub-block eval when the window's nearest candidate
    #                 entry distance (phase-1 per-tile min, floor-
    #                 quantised to 1/16 m in ent_ref) exceeds every
    #                 row's current best t.  Exact (strict-< RMW); built
    #                 for closed shells where front-face hits occlude
    #                 back faces and farther targets (docs/PERF.md r5b).
):
    base_i = 1 if packed_io else 3
    nshared = 15 if resident else 13
    sh = refs[base_i : base_i + nshared]
    (mn_ref, mx_ref, gmn_ref, gmx_ref, smn_ref, smx_ref,
     sorder_ref, gorder_ref, cand_ref, meta_ref, bits_ref, ent_ref,
     pack_hbm) = sh[:13]
    if resident:
        live_ref, live_tab = sh[13], sh[14]
    n_shade = 10 if emit_shade else 0
    if packed_io:
        rays_ref = refs[0]
        rest = refs[base_i + nshared:]
        (out_ref, stats_out, t_out, i_out, b_out, g_out) = rest[:6]
        s_outs = rest[6 : 6 + n_shade]  # per-field winner-shade scratches
        (pack_s, counters, sem) = rest[6 + n_shade:]
        # one (8,RT)->(RT,8) in-register transpose bridges the lane-major
        # HBM pack to the rays-on-sublanes MT evaluation layout; slicing
        # happens on the transposed VALUE (lane-dim REF slices of width
        # < 128 do not lower on Mosaic)
        rpt = jnp.transpose(rays_ref[:, :])  # [RT, 8]
        o = rpt[:, 0:3]
        d = rpt[:, 3:6]
        tmin = rpt[:, 6]
        # running-best accumulators are four [RT, 1] VMEM scratches —
        # the exact ref shape the legacy output blocks used (proven RMW
        # pattern), minus their per-tile pipeline DMA
    else:
        assert not emit_shade, "emit_shade requires the packed I/O layout"
        o_ref, d_ref, tmin_ref = refs[0:3]
        t_out, i_out, b_out, g_out, stats_out, pack_s, counters, sem = refs[base_i + nshared:]
        s_outs = ()
        o = o_ref[:]
        d = d_ref[:]
        tmin = tmin_ref[:, 0]
    itype = jnp.float32 if packed_io else jnp.int32  # best-tri storage dtype
    if _KERNEL_FLOOR & 1:
        # floor bisect: vreg-constant stand-ins (values are garbage)
        z1 = jnp.zeros((o.shape[0], 1), o.dtype)
        o0 = o1 = o2 = d0 = d1 = d2 = m0 = m1 = m2 = z1
    else:
        # Component columns [RT, 1]: K=3 contractions are VPU work, and
        # jnp.cross/stack concatenates don't lower on Mosaic — expand manually.
        o0, o1, o2 = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        d0, d1, d2 = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        # m = d x o (the (d x o) term of the MT identity)
        m0 = d1 * o2 - d2 * o1
        m1 = d2 * o0 - d0 * o2
        m2 = d0 * o1 - d1 * o0

    def dot3(a0, a1, a2, f):  # [RT,1] components @ [3,CS] field -> [RT,CS]
        return a0 * f[0:1, :] + a1 * f[1:2, :] + a2 * f[2:3, :]

    if not (_KERNEL_FLOOR & 2):
        t_out[:] = jnp.full_like(t_out, _BIG)
        i_out[:] = jnp.zeros_like(i_out)
        b_out[:] = jnp.zeros_like(b_out)
        g_out[:] = jnp.zeros_like(g_out)
        for s_o in s_outs:
            s_o[:] = jnp.zeros_like(s_o)
    counters[0] = jnp.int32(0)
    counters[1] = jnp.int32(0)

    cs = cluster_size
    nbuf = _dma_depth(k_max, mt_group)

    def get_dma(c, slot):
        """Async copy of cluster ``c``'s packed tile into scratch ``slot``
        (a lane-axis column block of the [16, nbuf*cs] scratch — the slot
        index can then be a traced value, where a leading-dim traced
        index could not lower on Mosaic)."""
        base = pl.multiple_of(c * cs, cs)
        dst = pl.multiple_of(slot * cs, cs)
        return pltpu.make_async_copy(
            pack_hbm.at[:, pl.ds(base, cs)],
            pack_s.at[:, pl.ds(dst, cs)],
            sem.at[slot],
        )

    if resident:
        # Candidate-mode fetch from the VMEM-resident live pack: a local
        # VMEM->VMEM copy (~100s ns vs ~us from HBM) — the DMA-wait slack
        # inside the window loop is what it removes.  Same semaphores and
        # start/wait lockstep as the HBM path (a wait without its start
        # crashes the chip — CLAUDE.md).
        def get_cdma(slot_id, slot):
            base = pl.multiple_of(slot_id * cs, cs)
            dst = pl.multiple_of(slot * cs, cs)
            return pltpu.make_async_copy(
                live_ref.at[:, pl.ds(base, cs)],
                pack_s.at[:, pl.ds(dst, cs)],
                sem.at[slot],
            )

        def live_global(slot_id):
            # SMEM scalar lookup: live slot -> global cluster id (row-packed
            # [ceil(cap/128), 128] like the other scalar tables)
            return live_tab[slot_id // 128, jax.lax.rem(slot_id, jnp.int32(128))]

    else:
        get_cdma = get_dma
        live_global = lambda slot_id: slot_id

    rt = o.shape[0]
    rs = rt // sub_tiles

    def process(c_list, slot0, bits_list=None, ent_min=None):
        """MT-test ``len(c_list)`` clusters sitting in CONTIGUOUS scratch
        slots starting at ``slot0`` as ONE [rows, m*cs] evaluation.

        The AABB overlap mask is deliberately NOT part of validity: a hit
        triangle always lies inside its own cluster's box, so the exact
        MT predicates subsume it — which is what lets processing be
        deferred past the slab stage for DMA/compute overlap.

        Rays are processed in ``sub_tiles`` row blocks.  The gate is the
        OR of the clusters' phase-1 bitmask bits when ``bits_list`` is
        given (candidate mode: one scalar test, no vector slab +
        scalar-sync ``any`` per block; the trade is losing the
        running-best prune on the MT, which only skipped ~12% of blocks
        on the bench), else an in-kernel slab test with the running-best
        prune (sweep mode, single cluster).

        PAIRING (m=2, candidate mode): one loop step, one branch per
        sub-block, one epilogue and one t/i/b/g read-modify-write cover
        TWO candidates — the per-candidate fixed cost (~2 us of DMA wait
        + sequencing + epilogue vs ~1 us of MT flops) halves.  A valid
        hit can only exist where the triangle's own cluster bit is set
        (hit => ray passes through the cluster AABB => phase-1 exact slab
        overlap), so union-gating never misses; columns of the nearer
        candidate come first, preserving the near-to-far tie-break —
        results are BIT-IDENTICAL to sequential processing.
        """
        m = len(c_list)
        off = pl.multiple_of(slot0 * cs, cs)
        pack = pack_s[:, pl.ds(off, m * cs)]
        n_t = pack[0:3, :]
        c1_t = pack[3:6, :]
        c0_t = pack[6:9, :]
        e1_t = pack[9:12, :]
        e0_t = pack[12:15, :]
        np0_t = pack[15:16, :]
        sh_t = pack[16:26, :] if emit_shade else None  # [10, m*cs] shade rows

        for k in range(sub_tiles):
            rows = slice(k * rs, (k + 1) * rs)

            def _eval(rows=rows):
                def sdot(a0, a1, a2, f):
                    return a0[rows] * f[0:1, :] + a1[rows] * f[1:2, :] + a2[rows] * f[2:3, :]

                denom = sdot(d0, d1, d2, n_t)
                inv = 1.0 / denom
                t = (np0_t - sdot(o0, o1, o2, n_t)) * inv
                beta = (sdot(d0, d1, d2, c1_t) - sdot(m0, m1, m2, e1_t)) * inv
                gamma = (sdot(d0, d1, d2, c0_t) - sdot(m0, m1, m2, e0_t)) * inv

                if _KERNEL_THIN_VALID:
                    # (t < MAX) is redundant for the RMW: a winner with
                    # t >= MAX still yields found = (best_t < MAX) =
                    # False downstream, and NaNs compare false here just
                    # as they failed (t < MAX) before.
                    valid = (
                        (t > tmin[rows][:, None])
                        & (jnp.minimum(beta, gamma) >= 0.0)
                        & (beta + gamma <= 1.0)
                    )
                else:
                    valid = (
                        (t < RT_DEFAULT_MAX)
                        & (t > tmin[rows][:, None])
                        & (beta >= 0.0)
                        & (gamma >= 0.0)
                        & (beta + gamma <= 1.0)
                    )
                t_m = jnp.where(valid, t, _BIG)
                tj = jnp.min(t_m, axis=1)
                # One-hot select of the winning column (first minimum) —
                # per-row gather is not lowerable on TPU.  Extracting the
                # winner's barycentrics here measures CHEAPER than
                # recomputing them outside from gathered pack columns:
                # a [16, T] column gather strides T*4 bytes per element —
                # measured +2.8 ms/pulse in round 2 AND re-confirmed in
                # round 3 (the epilogue-split variant that returned only
                # (t, tri) and gathered outside benched 1.47e6 vs 1.82e6
                # rays/s — the ~25% in-loop epilogue saving does not
                # cover the strided gather).
                cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
                j = jnp.min(jnp.where(t_m == tj[:, None], cols, jnp.int32(2**30)), axis=1)
                onehot = cols == j[:, None]
                beta_j = jnp.sum(jnp.where(onehot, beta, 0.0), axis=1)
                gamma_j = jnp.sum(jnp.where(onehot, gamma, 0.0), axis=1)
                # global triangle index: column block q belongs to cluster
                # c_list[q] (j is folded right-to-left so m=1 is branch-free)
                tri = c_list[-1] * cs + (j - (m - 1) * cs)
                for q in range(m - 2, -1, -1):
                    tri = jnp.where(j < (q + 1) * cs, c_list[q] * cs + (j - q * cs), tri)
                better = tj < t_out[rows, 0]
                t_out[rows, 0] = jnp.where(better, tj, t_out[rows, 0])
                i_out[rows, 0] = jnp.where(better, tri.astype(itype), i_out[rows, 0])
                b_out[rows, 0] = jnp.where(better, beta_j, b_out[rows, 0])
                g_out[rows, 0] = jnp.where(better, gamma_j, g_out[rows, 0])
                if emit_shade:
                    # Winner shade fields by the SAME one-hot (exactly one
                    # hot column per row, so each sum is the exact table
                    # value — no accumulation rounding).  Ten masked
                    # [rows, m*cs] reductions; the A/B against the XLA
                    # row gather they replace is in docs/PERF.md r5.
                    def _extract():
                        for q in range(10):
                            sq = jnp.sum(
                                jnp.where(onehot, sh_t[q : q + 1, :], 0.0), axis=1
                            )
                            s_outs[q][rows, 0] = jnp.where(
                                better, sq, s_outs[q][rows, 0]
                            )

                    if _SHADE_EMIT_GATED:
                        pl.when(jnp.any(better))(_extract)
                    else:
                        _extract()

            if bits_list is None:
                assert m == 1
                sub_overlap = _slab_overlap(
                    o[rows], d[rows], tmin[rows], t_out[rows, 0],
                    mn_ref[c_list[0], :], mx_ref[c_list[0], :],
                )
                pl.when(jnp.any(sub_overlap))(_eval)
            elif _KERNEL_UNGATED:
                # calibration: evaluate every sub-block unconditionally —
                # value-identical (validity subsumes the overlap gate)
                _eval()
            else:
                union = bits_list[0]
                for b in bits_list[1:]:
                    union = union | b
                cond = ((union >> k) & 1) != 0
                if mt_prune and ent_min is not None:
                    # Running-best window prune: the window's nearest
                    # candidate entry (per-tile min over rays, floored to
                    # 1/16 m) beyond every row's current best means no
                    # column can win the strict-< RMW — skip the eval.
                    # floor() only under-estimates the entry, so a skip
                    # implies true_entry > best for every row: EXACT.
                    bmax = jnp.max(t_out[rows, 0])
                    cond = cond & (ent_min.astype(jnp.float32) <= bmax * 16.0)
                pl.when(cond)(_eval)

    # Double-buffered pipeline: when cluster c's slab test passes, start
    # its DMA into slot cnt%2, then (with the copy in flight) process the
    # previously fetched cluster from the other slot.  Carry =
    # (has_pending, pending_cluster, hit_count).
    def on_hit(c, carry):
        pending, cp_id, cnt = carry
        counters[1] = counters[1] + 1
        slot = jax.lax.rem(cnt, jnp.int32(2))
        get_dma(c, slot).start()

        @pl.when(pending == 1)
        def _():
            prev = 1 - slot
            get_dma(cp_id, prev).wait()
            process([cp_id], prev)

        return (jnp.int32(1), jnp.int32(c), cnt + jnp.int32(1))

    def cluster_body(c, carry):
        best = t_out[:, 0]
        overlap = _slab_overlap(o, d, tmin, best, mn_ref[c, :], mx_ref[c, :])
        return jax.lax.cond(
            jnp.any(overlap), lambda cr: on_hit(c, cr), lambda cr: cr, carry
        )

    # Three-level culling: supergroup -> group -> cluster AABBs over
    # consecutive Morton runs.  The in-kernel loop overhead (not compute)
    # dominates when geometry misses, so each level's slab test must skip
    # ``super_size``/``group_size`` children at once.  Supergroups are
    # visited in the caller-provided near-to-far order so the running-best
    # prune (tn <= best) rejects far geometry without DMA.
    def group_body(gi, carry):
        g = gorder_ref[gi // 128, gi % 128]
        best = t_out[:, 0]
        overlap = _slab_overlap(o, d, tmin, best, gmn_ref[g, :], gmx_ref[g, :])

        def visit(cr):
            counters[0] = counters[0] + 1
            return jax.lax.fori_loop(g * group_size, (g + 1) * group_size, cluster_body, cr)

        return jax.lax.cond(jnp.any(overlap), visit, lambda cr: cr, carry)

    def super_body(si, carry):
        sg = sorder_ref[si // 128, si % 128]
        best = t_out[:, 0]
        overlap = _slab_overlap(o, d, tmin, best, smn_ref[sg, :], smx_ref[sg, :])
        if super_size == 1:
            # degenerate level: super box == group box, skip the re-test
            def visit(cr):
                counters[0] = counters[0] + 1
                return jax.lax.fori_loop(
                    sg * group_size, (sg + 1) * group_size, cluster_body, cr
                )

            return jax.lax.cond(jnp.any(overlap), visit, lambda cr: cr, carry)
        return jax.lax.cond(
            jnp.any(overlap),
            lambda cr: jax.lax.fori_loop(sg * super_size, (sg + 1) * super_size, group_body, cr),
            lambda cr: cr,
            carry,
        )

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    n_super = num_clusters // group_size // super_size
    if k_max > 0:
        # Candidate mode: loop only over the tile's precomputed near-to-far
        # candidate clusters (phase 1, _tile_candidates), with an
        # ``nbuf``-deep DMA pipeline — every candidate is an EXACT per-ray
        # overlap, so all of them are prefetched unconditionally (the
        # 2-deep wait-then-process chain was DMA-latency-bound at ~6 us
        # per candidate when compute per cluster is only ~1-3 us); each
        # sub-block's MT is gated by its phase-1 overlap bit (no in-kernel
        # slab test or running-best prune — the bit is one scalar test).
        # ``mt_group`` candidates are processed per fori step as one
        # full-width window to amortise the scalar loop control, branch
        # and epilogue over G*cs columns.  Overflowed tiles (more
        # overlaps than the list holds) take the full hierarchical sweep.
        tile = pl.program_id(0)
        # row-packed SMEM accessors (see the ref comments above)
        tpr = max(1, 128 // k_max)
        lrow, lbase = tile // tpr, (tile % tpr) * k_max
        cand_at = lambda i: cand_ref[lrow, lbase + i]
        bits_at = lambda i: bits_ref[lrow, lbase + i]
        ent_at = lambda i: ent_ref[lrow, lbase + i]

        def cand_path(cr):
            n_cand = meta_ref[tile // 64, (tile % 64) * 2]
            counters[0] = counters[0] + n_cand
            counters[1] = counters[1] + n_cand
            # Windows are full-width, so every slot up to the PADDED
            # count is waited on — padding slots (bits=0 repeats of the
            # last valid candidate) must get real DMAs or their waits
            # deadlock the chip.
            g_ = mt_group
            # Mixed-width tail (mt_tail): pad to g/2 instead of g and
            # evaluate one half-width window when the remainder fits —
            # padded duplicate columns are pure vector-flop waste (HW
            # cols 1520 vs 1192 union pairs/ray at the 63³ bench,
            # docs/PERF.md), and a typical 9.4-candidate tile pays 16
            # slots at g=8 where 12 suffice.  Bit-identical: padding
            # slots repeat the last valid candidate (idempotent RMW,
            # bits=0 adds nothing to the union gate).
            half = g_ // 2 if (mt_tail and mt_union and g_ >= 2) else 0
            unit = half if half else g_
            n_pad = ((n_cand + (unit - 1)) // unit) * unit
            for b in range(nbuf):

                @pl.when(b < n_pad)
                def _(b=b):
                    get_cdma(cand_at(b), b).start()

            def refill(i, slot):
                nxt = i + jnp.int32(nbuf)

                @pl.when(nxt < n_pad)
                def _():
                    get_cdma(cand_at(nxt), slot).start()

            g = mt_group

            def window(i, slot, m):
                """Wait on, evaluate and refill one m-wide window at
                candidate offset ``i`` / scratch slot ``slot``."""
                ids = [cand_at(i + q) for q in range(m)]
                for q in range(m):
                    get_cdma(ids[q], slot + q).wait()
                # tri-epilogue ids must be GLOBAL cluster ids; in resident
                # mode cand_ref holds live-pack slots
                gids = [live_global(x) for x in ids] if resident else ids
                if mt_prune:
                    em = ent_at(i)
                    for q in range(1, m):
                        em = jnp.minimum(em, ent_at(i + q))
                else:
                    em = None
                if mt_union:
                    # ONE m*cs-wide union-gated MT evaluation
                    process(
                        gids, slot,
                        bits_list=[bits_at(i + q) for q in range(m)],
                        ent_min=em,
                    )
                else:
                    # m-unrolled: per-candidate windows/bits (no union waste)
                    for q in range(m):
                        process(
                            [gids[q]], slot + q, bits_list=[bits_at(i + q)],
                            ent_min=ent_at(i + q) if mt_prune else None,
                        )
                for q in range(m):
                    refill(i + q, slot + q)

            def cand_step(s, c2):
                # s < ceil(n_cand/g) implies i < n_pad.  nbuf is a
                # multiple of g and i is a multiple of g, so the group's
                # slots (slot .. slot+g-1) never wrap the circular
                # scratch — one contiguous [16, g*cs] window.
                #
                # Every window is FULL-width (g, or g/2 for the tail
                # step under mt_tail): phase 1 pads each list slot >=
                # count by repeating the last valid candidate with
                # bits=0 (see _tile_candidates), so padding columns are
                # duplicates of an already-processed candidate —
                # union-gated identically (bits=0 adds nothing to the
                # union; a duplicate's RMW is idempotent and the one-hot
                # argmin keeps the first/nearer column).
                i = g * s
                slot = jax.lax.rem(i, jnp.int32(nbuf))
                if half:
                    is_full = (i + g) <= n_pad

                    @pl.when(is_full)
                    def _():
                        window(i, slot, g)

                    @pl.when(~is_full)
                    def _():
                        window(i, slot, half)

                else:
                    window(i, slot, g)
                return c2

            jax.lax.fori_loop(0, (n_cand + g - 1) // g, cand_step, jnp.int32(0))
            return cr

        if _KERNEL_FLOOR & 8:
            pending, cp_id, cnt = init
        else:
            pending, cp_id, cnt = jax.lax.cond(
                meta_ref[tile // 64, (tile % 64) * 2 + 1] != 0,
                lambda cr: jax.lax.fori_loop(0, n_super, super_body, cr),
                cand_path,
                init,
            )
    elif _KERNEL_FLOOR & 8:
        pending, cp_id, cnt = init
    else:
        pending, cp_id, cnt = jax.lax.fori_loop(0, n_super, super_body, init)

    # drain the last in-flight cluster
    if not (_KERNEL_FLOOR & 8):

        @pl.when(pending == 1)
        def _():
            last = jnp.int32(1) - jax.lax.rem(cnt, jnp.int32(2))
            get_dma(cp_id, last).wait()
            process([cp_id], last)

    if not (_KERNEL_FLOOR & 4):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        stats_out[:] = jnp.where(
            (row == 0) & (lane == 0),
            counters[0],
            jnp.where((row == 0) & (lane == 1), counters[1], 0),
        )

    if packed_io:
        # Combine the [RT, 1] best scratches into one [RT, 8/16] value
        # (lane-select writes — concat/stack don't lower on Mosaic), then
        # a single (RT,W)->(W,RT) transpose + ONE block write replaces
        # the four lane-padded [RT,1] output copies of the legacy layout.
        # With emit_shade the width is 16: rows 4-13 carry the winner's
        # shade fields.
        w = 16 if emit_shade else 8
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1)
        val8 = jnp.where(lane8 == 0, t_out[:, 0:1], 0.0)
        val8 = jnp.where(lane8 == 1, i_out[:, 0:1], val8)
        val8 = jnp.where(lane8 == 2, b_out[:, 0:1], val8)
        val8 = jnp.where(lane8 == 3, g_out[:, 0:1], val8)
        for q in range(n_shade):
            val8 = jnp.where(lane8 == 4 + q, s_outs[q][:, 0:1], val8)
        out_ref[:, :] = jnp.transpose(val8.astype(jnp.float32))


def _tile_candidates(origin, direction, tmin, mn, mx, ray_tile, sub_tiles, k_max,
                     cand_order="near", p1_fanout=None, p1_super_k=None,
                     p1_fanout0=None, p1_super_k0=None):
    """Phase 1: per-ray-tile candidate cluster lists (vectorised XLA).

    EXACT per-ray slab tests — the same predicate the kernel applies
    (minus the running-best prune, which only exists during traversal) —
    in a two-level hierarchy: rays vs supergroup boxes (runs of
    ``_P1_FANOUT`` clusters, [rays, C/fanout] dense), then rays vs the
    member clusters of each tile's overlapping supergroups only
    ([tiles, rays/tile, K_super*fanout] batched via one tiny gather).
    Exactness at both levels keeps lists tight; the hierarchy keeps the
    cost flat in cluster count (a flat [rays, C] pass was 0.9 ms/segment
    at C=1k and would quadruple at C=4k).

    A frustum (interval-hull) variant was tried first and rejected:
    whenever a tile's direction interval spans zero on an axis (every
    tile straddling the boresight), the reciprocal interval is
    unbounded, that axis stops constraining, and candidate counts blow
    up ~6x (measured 54 vs the exact 8.9 on the 1M-tri nadir bench).

    Returns (cand [tiles, k_max] int32, meta [tiles, 2] int32,
    bits [tiles, k_max] int32) with meta[:, 0] = candidate count and
    meta[:, 1] = 1 when the tile overlaps more than ``k_max`` clusters
    (the kernel then falls back to the full hierarchical sweep for that
    tile, keeping correctness unconditional).  ``bits`` bit b is set
    when ray sub-block b of the tile overlaps the candidate — the kernel
    gates each sub-block's MT on the precomputed bit instead of
    re-running a vector slab + scalar-sync ``any`` per sub-block.
    Candidates are sorted near-to-far by entry distance.
    """
    l = origin.shape[1]  # components-major [3, l]
    c = mn.shape[0]
    f32 = jnp.float32
    o = origin.astype(f32)  # [3, l]
    d = direction.astype(f32)
    alive = (d[0] * d[0] + d[1] * d[1] + d[2] * d[2]) > 0.0  # [l]
    big = jnp.float32(_BIG)
    mnf = mn.astype(f32)
    mxf = mx.astype(f32)
    tiles = l // ray_tile

    inv = 1.0 / jnp.where(d == 0.0, 1.0, d)  # [3, l]
    tmin_f = tmin.astype(f32)

    def batch_slab(bmn, bmx):
        """Exact per-ray slab vs a box set: [l or (tiles,rt), B] output.

        Rays arrive components-major ([3, l]); per-axis slices are [l]
        (or [tiles, rt]), so no lane-padded [l, 3] operand ever
        materialises.  Semantics identical to the kernel's _slab_overlap
        (d == 0 axes constrain nothing when o is inside the slab, kill
        otherwise).
        """
        if bmn.ndim == 2:  # [B, 3] shared box set
            comp = lambda a, ax: a[ax]  # [l]
            al_, tm_ = alive, tmin_f
            expand = lambda a: a[:, None]
            bsel = lambda a, ax: a[None, :, ax]
        else:  # [tiles, B, 3] per-tile box sets vs per-tile ray blocks
            comp = lambda a, ax: a[ax].reshape(tiles, ray_tile)
            al_ = alive.reshape(tiles, ray_tile)
            tm_ = tmin_f.reshape(tiles, ray_tile)
            expand = lambda a: a[..., None]
            bsel = lambda a, ax: a[:, None, :, ax]
        shape = al_.shape + (bmn.shape[-2],)
        tn = jnp.full(shape, -big, f32)
        tf = jnp.full(shape, big, f32)
        for ax in range(3):
            oa = expand(comp(o, ax))
            ia = expand(comp(inv, ax))
            t1 = (bsel(bmn, ax) - oa) * ia
            t2 = (bsel(bmx, ax) - oa) * ia
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            inside = (oa >= bsel(bmn, ax)) & (oa <= bsel(bmx, ax))
            dz = expand(comp(d, ax)) == 0.0
            lo = jnp.where(dz, jnp.where(inside, -big, big), lo)
            hi = jnp.where(dz, jnp.where(inside, big, -big), hi)
            tn = jnp.maximum(tn, lo)
            tf = jnp.minimum(tf, hi)
        box_ok = jnp.all(
            jnp.isfinite(bmn) & jnp.isfinite(bmx) & (bmn <= bmx), axis=-1
        )
        if bmn.ndim == 2:
            ok = box_ok[None, :]
        else:
            ok = box_ok[:, None, :]
        ov = (tf >= tn) & (tf >= expand(tm_)) & expand(al_) & ok
        return ov, jnp.where(ov, jnp.maximum(tn, 0.0), jnp.float32(jnp.inf))

    def batch_slab_rl(bmn, bmx):
        """Rays-on-LANES orientation of batch_slab (see _P1_RL): output
        [B, l] for a shared box set, [tiles, B, rt] for per-tile sets —
        the minor axis is the ray count (a 128 multiple, zero padding)
        instead of a 62/96-wide box list padded to the 128-lane tile.
        Element values are identical to batch_slab's (same per-(ray,box)
        arithmetic), only transposed."""
        if bmn.ndim == 2:  # [B, 3] shared box set -> [B, l]
            comp = lambda a, ax: a[ax][None, :]  # [1, l]
            al_, tm_ = alive[None, :], tmin_f[None, :]
            bsel = lambda a, ax: a[:, ax][:, None]  # [B, 1]
            shape = (bmn.shape[0], l)
        else:  # [tiles, B, 3] per-tile box sets -> [tiles, B, rt]
            comp = lambda a, ax: a[ax].reshape(tiles, 1, ray_tile)
            al_ = alive.reshape(tiles, 1, ray_tile)
            tm_ = tmin_f.reshape(tiles, 1, ray_tile)
            bsel = lambda a, ax: a[:, :, ax][..., None]  # [tiles, B, 1]
            shape = (tiles, bmn.shape[1], ray_tile)
        tn = jnp.full(shape, -big, f32)
        tf = jnp.full(shape, big, f32)
        for ax in range(3):
            oa = comp(o, ax)
            ia = comp(inv, ax)
            t1 = (bsel(bmn, ax) - oa) * ia
            t2 = (bsel(bmx, ax) - oa) * ia
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            inside = (oa >= bsel(bmn, ax)) & (oa <= bsel(bmx, ax))
            dz = comp(d, ax) == 0.0
            lo = jnp.where(dz, jnp.where(inside, -big, big), lo)
            hi = jnp.where(dz, jnp.where(inside, big, -big), hi)
            tn = jnp.maximum(tn, lo)
            tf = jnp.minimum(tf, hi)
        box_ok = jnp.all(
            jnp.isfinite(bmn) & jnp.isfinite(bmx) & (bmn <= bmx), axis=-1
        )
        ok = box_ok[:, None] if bmn.ndim == 2 else box_ok[..., None]
        ov = (tf >= tn) & (tf >= tm_) & al_ & ok
        return ov, jnp.where(ov, jnp.maximum(tn, 0.0), jnp.float32(jnp.inf))

    # --- level 1: exact per-ray tests against SUPERGROUP boxes (runs of
    # ``_P1_FANOUT`` consecutive clusters) — [l, S] with S = C/fanout
    fanout = p1_fanout or _P1_FANOUT
    s = -(-c // fanout)
    c_pad1 = s * fanout
    if c_pad1 > c:
        inf = jnp.float32(jnp.inf)
        mnp = jnp.concatenate([mnf, jnp.full((c_pad1 - c, 3), inf)], axis=0)
        mxp = jnp.concatenate([mxf, jnp.full((c_pad1 - c, 3), inf)], axis=0)
    else:
        mnp, mxp = mnf, mxf
    fin = jnp.isfinite(mnp[:, 0:1]) & jnp.isfinite(mxp[:, 0:1])
    s_mn = jnp.where(fin, mnp, big).reshape(s, fanout, 3).min(axis=1)
    s_mx = jnp.where(fin, mxp, -big).reshape(s, fanout, 3).max(axis=1)
    s_bad = s_mn[:, 0] > s_mx[:, 0]  # all-sentinel runs
    s_mn = jnp.where(s_bad[:, None], jnp.float32(jnp.inf), s_mn)
    s_mx = jnp.where(s_bad[:, None], jnp.float32(jnp.inf), s_mx)

    ks = min(p1_super_k or _P1_SUPER_K, s)
    if s >= _P1_L0_MIN_S:
        # --- level 0 (big scenes): the dense [l, S] supergroup pass was
        # 5.0 of 7.9 ms/segment at a 63^3 fan with S=489 (profile_phase1,
        # docs/PERF.md) — test rays against runs of _P1_FANOUT0
        # supergroups first ([l, S/f0]), then per tile only the member
        # supergroups of its admitted level-0 boxes ([tiles, rt,
        # K0*f0]).  Containment (ray overlaps supergroup => overlaps its
        # level-0 box) keeps the final lists identical to the dense
        # build; tiles admitting more level-0 boxes than _P1_SUPER_K0
        # overflow to the kernel's full hierarchical sweep.
        f0 = p1_fanout0 or _P1_FANOUT0
        s0 = -(-s // f0)
        s_pad0 = s0 * f0
        if s_pad0 > s:
            inf = jnp.float32(jnp.inf)
            smnp = jnp.concatenate([s_mn, jnp.full((s_pad0 - s, 3), inf)])
            smxp = jnp.concatenate([s_mx, jnp.full((s_pad0 - s, 3), inf)])
        else:
            smnp, smxp = s_mn, s_mx
        fin0 = jnp.isfinite(smnp[:, 0:1])  # sentinel supergroup boxes
        z_mn = jnp.where(fin0, smnp, big).reshape(s0, f0, 3).min(axis=1)
        z_mx = jnp.where(fin0, smxp, -big).reshape(s0, f0, 3).max(axis=1)
        z_bad = z_mn[:, 0] > z_mx[:, 0]
        z_mn = jnp.where(z_bad[:, None], jnp.float32(jnp.inf), z_mn)
        z_mx = jnp.where(z_bad[:, None], jnp.float32(jnp.inf), z_mx)
        if _P1_RL:
            ov_z, _ = batch_slab_rl(z_mn, z_mx)  # [S0, l]
            ov_z_t = jnp.any(ov_z.reshape(s0, tiles, ray_tile), axis=2).T
        else:
            ov_z, _ = batch_slab(z_mn, z_mx)  # [l, S0]
            ov_z_t = jnp.any(ov_z.reshape(tiles, ray_tile, s0), axis=1)
        k0 = min(p1_super_k0 or _P1_SUPER_K0, s0)
        z_count = jnp.sum(ov_z_t, axis=1).astype(jnp.int32)
        _, z_order = jax.lax.top_k(
            ov_z_t.astype(jnp.int32) * (s0 - jnp.arange(s0)), k0
        )
        l0_over = z_count > k0  # [tiles]
        # expand admitted level-0 boxes to their member supergroups and
        # re-test per tile (slots are distinct supergroups: top_k
        # positions are unique; s_pad0 tail slots are sentinel boxes)
        sg_slots = (z_order[..., None] * f0 + jnp.arange(f0)).reshape(tiles, k0 * f0)
        sg_slots = jnp.minimum(sg_slots, s_pad0 - 1)
        if _P1_RL:
            ov_s1, _ = batch_slab_rl(smnp[sg_slots], smxp[sg_slots])  # [tiles, k0*f0, rt]
            ov_s_t = jnp.any(ov_s1, axis=2)  # [tiles, k0*f0]
        else:
            ov_s1, _ = batch_slab(smnp[sg_slots], smxp[sg_slots])  # [tiles, rt, k0*f0]
            ov_s_t = jnp.any(ov_s1, axis=1)  # [tiles, k0*f0]
        nsl = k0 * f0
        s_count = jnp.sum(ov_s_t, axis=1).astype(jnp.int32)
        _, sel1 = jax.lax.top_k(
            ov_s_t.astype(jnp.int32) * (nsl - jnp.arange(nsl)), min(ks, nsl)
        )
        s_order = jnp.take_along_axis(sg_slots, sel1, axis=1)  # abs ids
        ks = min(ks, nsl)
        s_over = l0_over | (s_count > ks)
    else:
        if _P1_RL:
            ov_s, _ = batch_slab_rl(s_mn, s_mx)  # [S, l]
            ov_s_t = jnp.any(ov_s.reshape(s, tiles, ray_tile), axis=2).T  # [tiles, S]
        else:
            ov_s, _ = batch_slab(s_mn, s_mx)  # [l, S]
            ov_s_t = jnp.any(ov_s.reshape(tiles, ray_tile, s), axis=1)  # [tiles, S]
        s_count = jnp.sum(ov_s_t, axis=1).astype(jnp.int32)
        # nearest-first isn't needed at this level — order by index is
        # fine; pick the Ks overlapping supergroups (overlap sorts first)
        _, s_order = jax.lax.top_k(ov_s_t.astype(jnp.int32) * (s - jnp.arange(s)), ks)
        s_over = s_count > ks  # [tiles]

    # --- level 2: expand candidate supergroups to their member clusters
    # and run the exact per-ray test per tile against only those
    members = (s_order[..., None] * fanout + jnp.arange(fanout)).reshape(tiles, ks * fanout)
    members = jnp.minimum(members, c_pad1 - 1)
    cmn = mnp[members]  # [tiles, ks*fanout, 3] (tiny gather)
    cmx = mxp[members]
    rs = ray_tile // sub_tiles
    kf = ks * fanout
    if _P1_RL:
        ov_c, tnear_c = batch_slab_rl(cmn, cmx)  # [tiles, kf, rt]
        ov_sb = jnp.any(ov_c.reshape(tiles, kf, sub_tiles, rs), axis=3)  # [tiles, kf, st]
        tnear_sb = jnp.min(tnear_c.reshape(tiles, kf, sub_tiles, rs), axis=3)
        if _P1_SEL_MODE & 2:
            ov_sb, tnear_sb = jax.lax.optimization_barrier((ov_sb, tnear_sb))
        ov_ct = jnp.any(ov_sb, axis=2)  # [tiles, kf]
        tnear_t = jnp.min(tnear_sb, axis=2)
        weights = (1 << jnp.arange(sub_tiles, dtype=jnp.int32))[None, None, :]
        bits_all = jnp.sum(ov_sb.astype(jnp.int32) * weights, axis=2)  # [tiles, kf]
    else:
        ov_c, tnear_c = batch_slab(cmn, cmx)  # [tiles, rt, ks*fanout]
        # ONE reduction pass over the big [tiles, rt, kf] slab output, per
        # ray SUB-BLOCK (any + min over rs); the tile-level any/min and the
        # bitmask all derive from the tiny [tiles, st, kf] partials — vs
        # three independent rt-length reductions over the full intermediate
        ov_sb = jnp.any(ov_c.reshape(tiles, sub_tiles, rs, kf), axis=2)  # [tiles, st, kf]
        tnear_sb = jnp.min(tnear_c.reshape(tiles, sub_tiles, rs, kf), axis=2)
        if _P1_SEL_MODE & 2:
            ov_sb, tnear_sb = jax.lax.optimization_barrier((ov_sb, tnear_sb))
        ov_ct = jnp.any(ov_sb, axis=1)  # [tiles, ks*fanout] (slots are distinct
        # clusters: top_k indices are unique positions, padding slots are
        # sentinel boxes that never overlap)
        tnear_t = jnp.min(tnear_sb, axis=1)
        weights = (1 << jnp.arange(sub_tiles, dtype=jnp.int32))[None, :, None]
        bits_all = jnp.sum(ov_sb.astype(jnp.int32) * weights, axis=1)  # [tiles, kf]

    count = jnp.sum(ov_ct, axis=1).astype(jnp.int32)  # [tiles]
    k_eff = min(k_max, ks * fanout)
    # top_k of -tnear = the k_eff nearest overlapping clusters, ascending —
    # a partial selection, much cheaper than a full bitonic sort
    if _P1_SEL_MODE & 1:
        # order-identical int key: tnear_t >= 0 (or +inf), so its bit
        # pattern sorts like the value; invalid slots key 0 < any valid
        tb = jax.lax.bitcast_convert_type(tnear_t, jnp.int32)
        ikey = jnp.where(ov_ct, jnp.int32(2**31 - 1) - tb, jnp.int32(0))
        _, sel = jax.lax.top_k(ikey, k_eff)
    else:
        tkey = jnp.where(ov_ct, tnear_t, jnp.float32(jnp.inf))
        _, sel = jax.lax.top_k(-tkey, k_eff)
    # (member indices are < s*fanout = c_pad1 by construction: top_k
    # returns positions < s, so no clamp is needed)
    order = jnp.take_along_axis(members, sel, axis=1).astype(jnp.int32)
    bits = jnp.take_along_axis(bits_all, sel, axis=1).astype(jnp.int32)
    # per-candidate min entry distance (the sort key), floor-quantised to
    # 1/16 m as int32 for the kernel's running-best window prune
    # (mt_prune): floor only UNDER-estimates, keeping the prune exact.
    ent_f = jnp.take_along_axis(tnear_t, sel, axis=1)
    entq = jnp.floor(jnp.minimum(ent_f, 8.0e5) * 16.0).astype(jnp.int32)
    if k_eff < k_max:
        order = jnp.pad(order, ((0, 0), (0, k_max - k_eff)))
        bits = jnp.pad(bits, ((0, 0), (0, k_max - k_eff)))
        entq = jnp.pad(entq, ((0, 0), (0, k_max - k_eff)), constant_values=2**30)
    else:
        order = order[:, :k_max]
        bits = bits[:, :k_max]
        entq = entq[:, :k_max]
    over = s_over | (count > k_eff)
    meta = jnp.stack(
        [jnp.minimum(count, k_eff), over.astype(jnp.int32)], axis=1
    )
    if cand_order == "mask":
        # Regroup candidates so window-mates share sub-block masks: the
        # kernel's G-window union gate then rarely exceeds each member's
        # own mask, cutting union-gating waste (offline model
        # scripts/model_reorder.py: 0.81x MT pairs primary / 0.92x bounce
        # at cs=256 G=4).  MEASURED NEGATIVE on hardware (2.22e6 vs
        # 2.26e6 at 63³; docs/PERF.md round-3 negatives) — kept as an
        # option, default "near".  Sort key = (bitmask value,
        # near-to-far rank); invalid slots keep sorting last so the
        # kernel's first-count-slots contract holds.  Candidate order has
        # no in-kernel role in candidate mode beyond tie-breaking rays
        # whose two best triangles have exactly equal f32 t.
        if sub_tiles > 16:
            raise ValueError("cand_order='mask' supports sub_tiles <= 16")
        pos = jnp.arange(k_max, dtype=jnp.int32)[None, :]
        in_count = pos < meta[:, 0:1]
        key = jnp.where(in_count, (bits << 12) | pos, jnp.int32(2**30) + pos)
        perm = jnp.argsort(key, axis=1)
        order = jnp.take_along_axis(order, perm, axis=1)
        bits = jnp.take_along_axis(bits, perm, axis=1)
        entq = jnp.take_along_axis(entq, perm, axis=1)
    elif cand_order != "near":
        raise ValueError(f"cand_order must be 'near' or 'mask', got {cand_order!r}")
    # Pad slots >= count with the LAST VALID candidate id and bits=0, so
    # the kernel can process every G-window as a full [rows, G*cs]
    # evaluation with no tail path: padding columns are duplicates of an
    # already-evaluated candidate (idempotent RMW, first-column-wins
    # argmin keeps the real slot) and bits=0 adds nothing to the union
    # gate.  count==0 tiles pad with cluster 0 (their loop never runs,
    # but chunk boundaries must still see in-range DMA bases).
    pos = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    count_col = meta[:, 0:1]
    last = jnp.maximum(jnp.minimum(pos, count_col - 1), 0)
    order = jnp.where(
        count_col > 0, jnp.take_along_axis(order, last, axis=1), 0
    )
    bits = jnp.where(pos < count_col, bits, 0)
    # padding slots must not loosen a window's min-entry under mt_prune
    entq = jnp.where(pos < count_col, entq, jnp.int32(2**30))
    return order, meta, bits, entq


def _pack_smem_rows(a):
    """Row-pack a per-tile int32 SMEM array [n, w] -> [ceil(n/tpr), tpr*w]
    with tpr = max(1, 128 // w): SMEM rows are lane-padded to 128 int32
    (512 B) regardless of declared width, so narrow per-tile rows waste
    ~4x the chip's 1 MB SMEM (measured: the unpacked production 63^3
    layout used 998 KB; cs=128 configs went over).  Entry (t, i) lives at
    [t // tpr, (t % tpr) * w + i]."""
    n, w = a.shape
    tpr = max(1, 128 // w)
    rows = -(-n // tpr)
    pad = rows * tpr - n
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, w), a.dtype)])
    return a.reshape(rows, tpr * w)


def pack_tri_fields(tri_n, tri_c1, tri_c0, tri_e1, tri_e0, tri_np0):
    """[T,3] fields -> the kernel's packed [16, T] float32 layout."""
    return jnp.concatenate(
        [
            tri_n.T.astype(jnp.float32),
            tri_c1.T.astype(jnp.float32),
            tri_c0.T.astype(jnp.float32),
            tri_e1.T.astype(jnp.float32),
            tri_e0.T.astype(jnp.float32),
            tri_np0[None, :].astype(jnp.float32),
        ],
        axis=0,
    )


@partial(
    jax.jit,
    static_argnames=("cluster_size", "ray_tile", "group_size", "super_size", "sub_tiles", "candidates", "mt_group", "mt_union", "mt_tail", "cand_order", "p1_fanout", "p1_super_k", "p1_fanout0", "p1_super_k0", "interpret", "with_stats", "components", "resident_cap", "emit_shade", "mt_prune"),
)
def closest_hit_clustered(
    origin,  # [L, 3] ([3, L] with components=True)
    direction,  # [L, 3] ([3, L] with components=True)
    tmin,  # [L]
    tri_pack,  # [16, T] packed fields (pack_tri_fields), T = C * cluster_size
    aabb_mn,  # [C, 3]
    aabb_mx,  # [C, 3]
    sort_origin=None,  # [3] — visit groups near-to-far from here (e.g. Tx)
    *,
    cluster_size: int = 256,
    ray_tile: int = 256,
    group_size: int = 8,
    super_size: int = 8,
    sub_tiles: int = 4,
    candidates: int = 64,  # per-tile candidate-list width; 0 = sweep-only
    mt_group: int = 2,  # candidates per MT evaluation window (1/2/4/8/16/32)
    mt_union: bool = True,  # False: G-unrolled loop, per-candidate windows
    mt_tail: bool = False,  # half-width tail window (see _mt_kernel)
    mt_prune: bool = False,  # running-best candidate-window prune (see _mt_kernel)
    cand_order: str = "near",  # "mask": group window-mates by sub-block bitmask
    p1_fanout: int | None = None,  # phase-1 clusters per supergroup (default _P1_FANOUT)
    p1_super_k: int | None = None,  # phase-1 admitted supergroups per tile (default _P1_SUPER_K)
    p1_fanout0: int | None = None,  # phase-1 supergroups per level-0 run (default _P1_FANOUT0)
    p1_super_k0: int | None = None,  # phase-1 admitted level-0 runs per tile (default _P1_SUPER_K0)
    interpret: bool = False,
    with_stats: bool = False,
    components: bool = False,  # True: origin/direction are [3, L] (engine layout)
    resident_cap: int = 0,  # >0: keep up to this many live clusters VMEM-
    #   resident and assemble candidate windows by VMEM-local copies
    #   (bit-identical; live-set overflow falls back to the sweep)
    emit_shade: bool = False,  # kernel epilogue extracts the winner's 10
    #   shade fields (pack rows 16-25; animate_packed shade_rows=True)
    #   and HitResult.shade returns them [10, L] — replaces the hit
    #   body's [T, 10] row gather.  Requires a 32-row pack; silently
    #   degrades to shade=None when packed I/O is unavailable.
) -> HitResult:
    """Closest valid triangle per ray via clustered traversal (float32).

    With ``with_stats`` also returns an int32 [tiles, 2] array of
    (candidates/groups visited, clusters processed) per ray tile — the
    traversal workload counters used for culling-quality analysis.

    ``components=True`` takes [3, L] components-major rays — the engine's
    lane layout (core/vec.py dot3c rationale) — avoiding every [L, 3]
    lane-padded materialisation on the way in.  Row-layout callers
    (profilers, tests) are transposed at entry.
    """
    if not components:
        origin = origin.T
        direction = direction.T
    l = origin.shape[1]
    t_total = tri_pack.shape[1]
    if tri_pack.shape[0] not in (16, 32):
        raise ValueError(
            f"tri_pack must have 16 rows (pack_tri_fields) or 32 "
            f"(animate_packed shade_rows=True); got {tri_pack.shape[0]}"
        )
    if t_total % cluster_size:
        raise ValueError(
            f"tri_pack columns ({t_total}) must be a multiple of cluster_size "
            f"({cluster_size}) — pad via accel.cluster_reorder, else trailing "
            "triangles would be silently dropped"
        )
    if ray_tile % sub_tiles:
        raise ValueError(f"ray_tile ({ray_tile}) must be divisible by sub_tiles ({sub_tiles})")
    c = t_total // cluster_size
    if aabb_mn.shape[0] != c or aabb_mx.shape[0] != c:
        raise ValueError(f"AABB rows ({aabb_mn.shape[0]}) != cluster count ({c})")
    rt = ray_tile

    # Narrow wider-dtype boxes to f32 OUTWARD: plain round-to-nearest can
    # shrink a box below its (independently f32-rounded) triangles and
    # cull a genuine graze hit.  (The production engine is f32 end-to-end;
    # this only fires for f64 experiments.)
    if aabb_mn.dtype != jnp.float32:
        mn32 = aabb_mn.astype(jnp.float32)
        mx32 = aabb_mx.astype(jnp.float32)
        aabb_mn = jnp.where(
            mn32.astype(aabb_mn.dtype) > aabb_mn,
            jnp.nextafter(mn32, jnp.float32(-jnp.inf)),
            mn32,
        )
        aabb_mx = jnp.where(
            mx32.astype(aabb_mx.dtype) < aabb_mx,
            jnp.nextafter(mx32, jnp.float32(jnp.inf)),
            mx32,
        )

    # Pad the cluster list to a group*supergroup multiple with [+inf,+inf]
    # boxes: a valid interval at infinite distance, rejected by the slab
    # test's (tn <= best)/(tf >= tmin) terms for every ray (see
    # _slab_overlap), so padding clusters never reach the DMA stage and
    # their out-of-bounds pack bases (c*cs >= T) are unreachable.  An
    # INVERTED box would NOT be rejected — min/max un-inverts it.
    c_pad = -(-c // (group_size * super_size)) * (group_size * super_size)
    inf = float("inf")
    if c_pad > c:
        pad = c_pad - c
        aabb_mn = jnp.concatenate([aabb_mn, jnp.full((pad, 3), inf, aabb_mn.dtype)])
        aabb_mx = jnp.concatenate([aabb_mx, jnp.full((pad, 3), inf, aabb_mx.dtype)])
    g_mn = aabb_mn.reshape(c_pad // group_size, group_size, 3).min(axis=1)
    g_mx = aabb_mx.reshape(c_pad // group_size, group_size, 3).max(axis=1)
    n_super = c_pad // group_size // super_size
    s_mn = g_mn.reshape(n_super, super_size, 3).min(axis=1)
    s_mx = g_mx.reshape(n_super, super_size, 3).max(axis=1)
    n_groups = c_pad // group_size
    if sort_origin is None:
        s_order = jnp.arange(n_super, dtype=jnp.int32)[:, None]
        g_order = jnp.arange(n_groups, dtype=jnp.int32)[:, None]
    else:
        centre = (s_mn + s_mx) * 0.5
        dist = jnp.sum((centre - jnp.asarray(sort_origin)[None, :]) ** 2, axis=1)
        # inverted (all-padding) supergroups can never overlap — push last
        dist = jnp.where(jnp.isfinite(dist) & (s_mn[:, 0] <= s_mx[:, 0]), dist, jnp.inf)
        s_order = jnp.argsort(dist).astype(jnp.int32)[:, None]
        # near-to-far group order WITHIN each supergroup, so the running-
        # best prune fires as early at the group level as at the super
        # level (the round-1 3-level attempt lost to index-order groups)
        gc = (g_mn + g_mx) * 0.5
        gd = jnp.sum((gc - jnp.asarray(sort_origin)[None, :]) ** 2, axis=1)
        gd = jnp.where(jnp.isfinite(gd) & (g_mn[:, 0] <= g_mx[:, 0]), gd, jnp.inf)
        local = jnp.argsort(gd.reshape(n_super, super_size), axis=1).astype(jnp.int32)
        base_i = (jnp.arange(n_super, dtype=jnp.int32) * super_size)[:, None]
        g_order = (base_i + local).reshape(-1)[:, None]

    l_pad = -(-l // rt) * rt
    if l_pad > l:
        pad = l_pad - l
        origin = jnp.concatenate([origin, jnp.zeros((3, pad), origin.dtype)], axis=1)
        direction = jnp.concatenate([direction, jnp.zeros((3, pad), direction.dtype)], axis=1)
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), tmin.dtype)])

    f32 = jnp.float32
    resident = resident_cap > 0 and candidates > 0
    if resident:
        # The live pack is a single [rows, cap*cs] f32 VMEM block; fail
        # with a sizing message instead of an opaque Mosaic OOM.
        live_bytes = resident_cap * cluster_size * tri_pack.shape[0] * 4
        vmem_budget = 12 * 1024 * 1024  # ~16 MB VMEM minus scratch/IO blocks
        if live_bytes > vmem_budget:
            raise ValueError(
                f"resident_cap={resident_cap} needs {live_bytes / 1e6:.1f} MB of "
                f"VMEM for the live pack ({tri_pack.shape[0]} rows x "
                f"{resident_cap}*{cluster_size} lanes f32) — over the "
                f"~{vmem_budget / 1e6:.0f} MB budget; lower resident_cap or "
                "cluster_size (docs/PERF.md 'r4 successor-family spike')"
            )
    live_pack = live_tab = None
    if candidates > 0:
        cand, meta, bits, ent = _tile_candidates(
            origin, direction, tmin, aabb_mn, aabb_mx, rt, sub_tiles, candidates,
            cand_order, p1_fanout, p1_super_k, p1_fanout0, p1_super_k0,
        )
        if not mt_prune:
            # the kernel never reads ent_ref without the prune (static
            # flag): a 1-wide dummy keeps the operand layout while XLA
            # dead-code-eliminates the phase-1 entq build and the SMEM
            # table transfer — the always-present table cost the terrain
            # headline ~1% (docs/PERF.md r5f)
            ent = jnp.zeros((cand.shape[0], 1), jnp.int32)
        k_width = candidates
        if resident:
            # RESIDENT live-cluster pack (docs/PERF.md "r4 successor-family
            # spike"): the union of all tiles' candidates is tiny on
            # footprint-limited fans (53 clusters at the 63³ bench), so
            # the whole candidate working set is gathered ONCE into a
            # [16, cap*cs] VMEM block and windows assemble by VMEM-local
            # copies — no HBM DMA latency inside the candidate loop.
            # cand is remapped to live-pack slots; live_tab recovers the
            # global ids for the kernel's tri epilogue.  If the live set
            # exceeds the cap, every tile is flagged for the hierarchical
            # sweep fallback (correct, slow — size the cap generously).
            flat = cand.reshape(-1)
            s = jnp.sort(flat)
            firstu = jnp.concatenate(
                [jnp.ones((1,), bool), s[1:] != s[:-1]]
            )
            nlive = jnp.sum(firstu.astype(jnp.int32))
            rank = jnp.cumsum(firstu.astype(jnp.int32))  # 1-based unique rank
            jj = jnp.arange(resident_cap, dtype=jnp.int32)
            idx = jnp.searchsorted(rank, jj + 1, side="left").astype(jnp.int32)
            live_sorted = jnp.where(
                jj < nlive,
                s[jnp.clip(idx, 0, s.shape[0] - 1)],
                jnp.int32(2**30),
            )
            slots = jnp.clip(
                jnp.searchsorted(live_sorted, cand).astype(jnp.int32),
                0, resident_cap - 1,
            )
            live_ovf = (nlive > resident_cap).astype(jnp.int32)
            meta = meta.at[:, 1].set(jnp.maximum(meta[:, 1], live_ovf))
            cand = slots
            # candidates are always REAL clusters (padding boxes are +inf
            # and never overlap), so clip the sentinel tail to c-1
            live_ids = jnp.clip(live_sorted, 0, c - 1)
            live_cols = (
                live_ids[:, None] * cluster_size
                + jnp.arange(cluster_size, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            live_pack = tri_pack.astype(jnp.float32)[:, live_cols]
            live_tab = _pack_smem_rows(live_ids[:, None])
    else:
        # sweep-only mode: dummy lists, overflow flag forces the sweep path
        n_t = l_pad // rt
        cand = jnp.zeros((n_t, 1), jnp.int32)
        meta = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (n_t, 1))
        bits = jnp.zeros((n_t, 1), jnp.int32)
        ent = jnp.zeros((n_t, 1), jnp.int32)
        k_width = 1
    grid = (l_pad // rt,)
    if mt_group not in (1, 2, 4, 8, 16, 32):
        raise ValueError(f"mt_group must be 1/2/4/8/16/32, got {mt_group}")
    if candidates > 0:
        # windows are always full-width (phase-1 pads each list to a
        # multiple of g with bits=0 repeats), so the list width must
        # hold whole windows; narrow lists clamp the window instead
        mt_group = min(mt_group, candidates)
        if candidates % mt_group:
            raise ValueError(
                f"candidates ({candidates}) must be a multiple of mt_group "
                f"({mt_group})"
            )
    # tri ids ride the packed f32 output row; exact only below 2^24
    packed_io = _PACKED_IO and c_pad * cluster_size < 2**24
    if emit_shade:
        if tri_pack.shape[0] != 32:
            raise ValueError(
                f"emit_shade needs the 32-row pack (16 geometry + 10 shade "
                f"rows, animate_packed shade_rows=True); got "
                f"{tri_pack.shape[0]} rows"
            )
        # legacy (non-packed) I/O has no shade output rows — degrade to
        # the gather path rather than fail (caller checks hit.shade)
        emit_shade = packed_io
    kernel = partial(
        _mt_kernel, packed_io=packed_io, num_clusters=c_pad,
        cluster_size=cluster_size,
        group_size=group_size, super_size=super_size, sub_tiles=sub_tiles,
        k_max=candidates, mt_group=mt_group, mt_union=mt_union, mt_tail=mt_tail,
        resident=resident, emit_shade=emit_shade, mt_prune=mt_prune,
    )

    n_tiles = l_pad // rt
    ray_spec = pl.BlockSpec((rt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tmin_spec = pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rays8_spec = pl.BlockSpec((8, rt), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if packed_io:
        # ONE lane-major [8, lp] ray pack: rows o0,o1,o2,d0,d1,d2,tmin,pad.
        # 16 KB per grid-step DMA vs ~1.8 MB for the lane-padded legacy
        # blocks (see _PACKED_IO above / docs/PERF.md r3q).  Inputs are
        # already components-major, so this is a zero-transpose concat.
        rays8 = jnp.concatenate(
            [origin.astype(f32), direction.astype(f32),
             tmin.astype(f32)[None, :], jnp.zeros((1, l_pad), f32)], axis=0,
        )
        o32 = d32 = tm32 = None
    else:
        o32 = origin.T.astype(f32)
        d32 = direction.T.astype(f32)
        tm32 = tmin.astype(f32)[:, None]
    shared = (
        aabb_mn.astype(f32),
        aabb_mx.astype(f32),
        g_mn.astype(f32),
        g_mx.astype(f32),
        s_mn.astype(f32),
        s_mx.astype(f32),
        _pack_smem_rows(s_order),
        _pack_smem_rows(g_order),
    )

    shared_specs = [
        full(),
        full(),
        full(),
        full(),
        full(),
        full(),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if resident:
        # live pack: full VMEM block with a constant index map — the
        # pipeline fetches it once, grid steps revisit the same block
        shared_specs += [full(), pl.BlockSpec(memory_space=pltpu.SMEM)]
    dma_scratch = [
        # scratch rows track the pack (16, or 26 with shade rows): the
        # cluster DMA copies full leading-dim slices
        pltpu.VMEM(
            (tri_pack.shape[0], _dma_depth(candidates, mt_group) * cluster_size),
            f32,
        ),
        pltpu.SMEM((2,), jnp.int32),
        pltpu.SemaphoreType.DMA((_dma_depth(candidates, mt_group),)),
    ]

    def run(rays_c, cand_c, meta_c, bits_c, ent_c):
        # rays_c: [8, lanes] pack (packed_io) or (o, d, tmin[:, None]) tuple
        lanes_c = rays_c.shape[1] if packed_io else rays_c[0].shape[0]
        tiles_c = lanes_c // rt
        cand_c = _pack_smem_rows(cand_c)
        meta_c = _pack_smem_rows(meta_c)
        bits_c = _pack_smem_rows(bits_c)
        ent_c = _pack_smem_rows(ent_c)
        tail = (tri_pack.astype(f32),)
        if resident:
            tail = tail + (live_pack, live_tab)
        if packed_io:
            ow = 16 if emit_shade else 8
            out_shape = [
                jax.ShapeDtypeStruct((ow, lanes_c), f32),
                jax.ShapeDtypeStruct((tiles_c * 8, 128), jnp.int32),
            ]
            return pl.pallas_call(
                kernel,
                grid=(tiles_c,),
                out_shape=out_shape,
                in_specs=[rays8_spec] + shared_specs,
                out_specs=[
                    pl.BlockSpec((ow, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
                    stats_spec,
                ],
                scratch_shapes=[
                    pltpu.VMEM((rt, 1), f32)
                    for _ in range(14 if emit_shade else 4)
                ]
                + dma_scratch,
                interpret=interpret,
            )(rays_c, *shared, cand_c, meta_c, bits_c, ent_c, *tail)
        out_shape = [
            jax.ShapeDtypeStruct((lanes_c, 1), f32),
            jax.ShapeDtypeStruct((lanes_c, 1), jnp.int32),
            jax.ShapeDtypeStruct((lanes_c, 1), f32),
            jax.ShapeDtypeStruct((lanes_c, 1), f32),
            jax.ShapeDtypeStruct((tiles_c * 8, 128), jnp.int32),
        ]
        return pl.pallas_call(
            kernel,
            grid=(tiles_c,),
            out_shape=out_shape,
            in_specs=[ray_spec, ray_spec, tmin_spec] + shared_specs,
            out_specs=[out_spec, out_spec, out_spec, out_spec, stats_spec],
            scratch_shapes=dma_scratch,
            interpret=interpret,
        )(*rays_c, *shared, cand_c, meta_c, bits_c, ent_c, *tail)

    # The row-packed candidate/meta/bits lists live in SMEM; chunk the
    # grid so very large fans (thousands of tiles) never exceed the
    # scalar-memory budget — each chunk is an independent pallas_call.
    # Packed footprint: cand+bits pay 512 B per tpr tiles each, meta
    # 512 B per 64 tiles (SMEM rows are 128 int32 whatever the width).
    tpr_c = max(1, 128 // k_width)
    # cand + bits (+ ent under mt_prune) pay 512 B per tpr tiles each;
    # the prune-off dummy ent is 1-wide (4 B/tile); meta 8 B/tile
    per_tile_bytes = (1536 // tpr_c if mt_prune else 1024 // tpr_c + 4) + 8
    max_tiles = max(1, _SMEM_LIST_BUDGET // per_tile_bytes)
    if n_tiles > max_tiles:
        parts = []
        for s0 in range(0, n_tiles, max_tiles):
            s1 = min(s0 + max_tiles, n_tiles)
            rays_c = (
                rays8[:, s0 * rt : s1 * rt]
                if packed_io
                else (
                    o32[s0 * rt : s1 * rt],
                    d32[s0 * rt : s1 * rt],
                    tm32[s0 * rt : s1 * rt],
                )
            )
            parts.append(
                run(rays_c, cand[s0:s1], meta[s0:s1], bits[s0:s1], ent[s0:s1])
            )
        if packed_io:
            out8 = jnp.concatenate([p[0] for p in parts], axis=1)
            stats = jnp.concatenate([p[1] for p in parts], axis=0)
        else:
            best_t, best_i, best_b, best_g, stats = (
                jnp.concatenate([p[i] for p in parts], axis=0) for i in range(5)
            )
    else:
        rays_c = rays8 if packed_io else (o32, d32, tm32)
        if packed_io:
            out8, stats = run(rays_c, cand, meta, bits, ent)
        else:
            best_t, best_i, best_b, best_g, stats = run(rays_c, cand, meta, bits, ent)

    shade = None
    if packed_io:
        best_t = out8[0, :l]
        # exact: tri ids < 2^24 round-trip f32 losslessly (guard above)
        best_tri = out8[1, :l].astype(jnp.int32)
        best_b, best_g = out8[2, :l], out8[3, :l]
        if emit_shade:
            shade = out8[4:14, :l].astype(origin.dtype)
    else:
        best_t = best_t[:l, 0]
        best_tri = best_i[:l, 0]
        best_b, best_g = best_b[:l, 0], best_g[:l, 0]
    found = best_t < RT_DEFAULT_MAX
    hit = HitResult(
        t=jnp.where(found, best_t, jnp.inf).astype(origin.dtype),
        tri=best_tri,
        beta=best_b.astype(origin.dtype),
        gamma=best_g.astype(origin.dtype),
        found=found,
        shade=shade,
    )
    if with_stats:
        return hit, stats[::8, :2]
    return hit
