"""Clustered Pallas traversal vs brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rts_tpu import Parameters
from rts_tpu.accel import cluster_aabbs, cluster_reorder, morton_order
from rts_tpu.engine.intersect import closest_hit_bruteforce
from rts_tpu.engine.types import scene_to_device
from rts_tpu.geometry import rect_mesh, sphere_mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.ops import closest_hit_clustered, pack_tri_fields

CS, RT = 128, 128


def make_scene():
    mesh, _ = sphere_mesh(3, 50.0)
    plate = rect_mesh(2.0, 150.0, 150.0).translated([300.0, 100.0, 0.0])
    scene = compile_scene(
        [mesh.translated([900.0, 0.0, 0.0]), plate], [0.9, 0.7], [1.0, 1.0]
    )
    return cluster_reorder(scene, cluster_size=CS)


def run_clustered(dev, o, d, tmin):
    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    pack = pack_tri_fields(dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0)
    return closest_hit_clustered(
        o, d, tmin, pack, mn, mx, cluster_size=CS, ray_tile=RT, interpret=True
    )


def test_slab_overlap_rejects_inf_sentinel_boxes():
    """Padding sentinel boxes must be [+inf, +inf] and self-reject for
    EVERY direction-sign combination (an inverted [+BIG, -BIG] box would
    be silently un-inverted by the slab's min/max and send padding
    clusters to the DMA stage with out-of-bounds bases)."""
    from rts_tpu.ops.cluster_trace import _BIG, _slab_overlap

    o = jnp.asarray([[0.0, 0.0, 0.0]] * 4, jnp.float32)
    d = jnp.asarray(
        [[1.0, 0.5, 0.25], [-1.0, 2.0, 0.5], [-1.0, -2.0, -0.5], [1.0, 0.0, 0.5]],
        jnp.float32,
    )
    tmin = jnp.zeros(4, jnp.float32)
    best = jnp.full(4, _BIG, jnp.float32)
    inf = jnp.float32(float("inf"))
    mn = jnp.full(3, inf)
    mx = jnp.full(3, inf)
    assert not bool(_slab_overlap(o, d, tmin, best, mn, mx).any())
    # a real box containing the first ray's path still overlaps
    mn2 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    mx2 = jnp.asarray([3.0, 2.0, 1.0], jnp.float32)
    assert bool(_slab_overlap(o, d, tmin, best, mn2, mx2)[0])


def test_padding_clusters_never_processed():
    """With heavy cluster padding (c << group*super multiple), the stats
    counters must show only real clusters reaching the DMA/MT stage."""
    mesh, _ = sphere_mesh(2, 50.0)
    scene = compile_scene([mesh.translated([900.0, 0.0, 0.0])], [0.9], [1.0])
    scene = cluster_reorder(scene, cluster_size=CS)
    dev = scene_to_device(scene, dtype=jnp.float32)
    c_real = dev.tri_p0.shape[0] // CS
    assert c_real < 64  # defaults pad to group_size*super_size = 64

    l = RT
    o = jnp.zeros((l, 3), jnp.float32)
    d = jnp.stack(
        [jnp.ones(l), jnp.linspace(-0.1, 0.1, l), jnp.linspace(-0.05, 0.05, l)], axis=-1
    ).astype(jnp.float32)
    tmin = jnp.full((l,), 0.005, jnp.float32)

    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    pack = pack_tri_fields(dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0)
    hit, stats = closest_hit_clustered(
        o, d, tmin, pack, mn, mx, cluster_size=CS, ray_tile=RT,
        interpret=True, with_stats=True,
    )
    assert bool(hit.found.any())
    clusters_processed = int(np.asarray(stats)[:, 1].max())
    assert 0 < clusters_processed <= c_real

    ref = closest_hit_bruteforce(
        o, d, tmin, dev.tri_p0, dev.tri_e0, dev.tri_e1, dev.tri_n,
        dev.tri_c1, dev.tri_c0, dev.tri_np0, tri_chunk=64,
    )
    np.testing.assert_array_equal(np.asarray(hit.found), np.asarray(ref.found))
    f = np.asarray(ref.found)
    np.testing.assert_array_equal(np.asarray(hit.tri)[f], np.asarray(ref.tri)[f])


def test_morton_order_is_permutation():
    scene = make_scene()
    perm = morton_order(scene.tri_verts[: scene.num_real_tris])
    assert sorted(perm.tolist()) == list(range(scene.num_real_tris))


def test_cluster_reorder_pads_and_preserves():
    mesh, _ = sphere_mesh(2, 10.0)
    scene = compile_scene([mesh], [1.0], [1.0])
    out = cluster_reorder(scene, cluster_size=CS)
    assert out.tri_verts.shape[0] % CS == 0
    assert out.num_real_tris == scene.num_real_tris
    # same triangle multiset (sorted corner sums)
    a = np.sort(scene.tri_verts[: scene.num_real_tris].sum(axis=(1, 2)))
    b = np.sort(out.tri_verts[: out.num_real_tris].sum(axis=(1, 2)))
    np.testing.assert_allclose(a, b)


def test_cluster_reorder_is_target_major():
    """Morton codes are computed on the BASE mesh, where every target
    sits at its model origin — a global sort interleaves co-located
    targets and every animated cluster AABB then spans ALL targets
    (docs/PERF.md r6: the 4-sphere moving scene collapsed into the
    scalar sweep, 41x slower).  cluster_reorder must keep triangles
    TARGET-MAJOR: each target's triangles contiguous, so at most one
    cluster straddles each target boundary."""
    mesh, _ = sphere_mesh(2, 10.0)
    # two targets whose BASE meshes are co-located at the origin
    scene = compile_scene([mesh, mesh], [1.0, 0.8], [1.0, 1.0])
    out = cluster_reorder(scene, cluster_size=CS)
    tt = out.tri_target[: out.num_real_tris]
    # target-major: target ids are non-decreasing over the real range
    assert (np.diff(tt) >= 0).all(), "targets interleaved after reorder"
    # within each target, the order is still Morton (locality): check the
    # first target's slice equals a pure-Morton sort of its own triangles
    n0 = int((tt == 0).sum())
    own = morton_order(out.tri_verts[:n0])
    # Morton of an already-Morton-sorted slice is the identity
    assert (own == np.arange(n0)).all()


def test_kernel_matches_bruteforce():
    scene = make_scene()
    dev = scene_to_device(scene, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    l = 300
    o = np.zeros((l, 3))
    o[100:200] = rng.uniform(-50, 950, (100, 3))
    o[200:] = [900, 0, 0]
    d = np.zeros((l, 3))
    d[:100] = np.stack(
        [np.ones(100), rng.uniform(-0.1, 0.1, 100), rng.uniform(-0.1, 0.1, 100)], -1
    )
    d[100:250] = rng.normal(size=(150, 3))
    d[250:] = 0.0  # dead lanes must stay not-found
    tmin = np.full(l, 0.005, np.float32)

    o = jnp.asarray(o, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)
    tm = jnp.asarray(tmin)

    ref = closest_hit_bruteforce(
        o, dj, tm, dev.tri_p0, dev.tri_e0, dev.tri_e1, dev.tri_n,
        dev.tri_c1, dev.tri_c0, dev.tri_np0, tri_chunk=64,
    )
    got = run_clustered(dev, o, dj, tm)

    np.testing.assert_array_equal(np.asarray(got.found), np.asarray(ref.found))
    f = np.asarray(ref.found)
    assert f.sum() > 50
    np.testing.assert_allclose(np.asarray(got.t)[f], np.asarray(ref.t)[f], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[f], np.asarray(ref.tri)[f])
    # Barycentrics suffer f32 cancellation in (d.c1 - (d x o).e1) at ~1 km
    # origins; kernel (broadcast-sum) and brute (matmul) round differently.
    np.testing.assert_allclose(np.asarray(got.beta)[f], np.asarray(ref.beta)[f], rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.gamma)[f], np.asarray(ref.gamma)[f], rtol=2e-3, atol=1e-5)


def _random_rays(l=256, seed=0):
    rng = np.random.default_rng(seed)
    o = np.zeros((l, 3))
    o[l // 2 :] = rng.uniform(-100, 1000, (l - l // 2, 3))
    d = np.zeros((l, 3))
    d[: l // 4] = np.stack(
        [np.ones(l // 4), rng.uniform(-0.1, 0.1, l // 4), rng.uniform(-0.1, 0.1, l // 4)], -1
    )
    d[l // 4 : -8] = rng.normal(size=(l - l // 4 - 8, 3))  # incoherent block
    # last 8 lanes dead (d = 0)
    tmin = np.full(l, 0.005, np.float32)
    return (
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.asarray(tmin),
    )


def test_candidate_modes_agree():
    """Candidate traversal (generous K), forced-overflow fallback (K=1)
    and sweep-only (candidates=0) must produce identical hits."""
    scene = make_scene()
    dev = scene_to_device(scene, dtype=jnp.float32)
    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    pack = pack_tri_fields(dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0)
    o, d, tm = _random_rays()

    outs = {}
    for k in (0, 1, 64):
        outs[k] = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=k, interpret=True,
        )
    assert int(outs[64].found.sum()) > 20
    for k in (0, 1):
        np.testing.assert_array_equal(np.asarray(outs[k].found), np.asarray(outs[64].found))
        f = np.asarray(outs[64].found)
        np.testing.assert_array_equal(np.asarray(outs[k].tri)[f], np.asarray(outs[64].tri)[f])
        np.testing.assert_array_equal(np.asarray(outs[k].t)[f], np.asarray(outs[64].t)[f])
    # mt_group: G candidates per MT window must be BIT-identical to
    # sequential (union gate can only add evaluations; the near
    # candidate's columns come first, preserving the tie-break)
    for g, un in ((1, True), (4, True), (4, False), (8, False), (16, True), (32, True)):
        out_g = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, mt_group=g, mt_union=un, interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_g, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} mt_group={g} union={un}",
            )
    # half-width tail windows: padding to G/2 and evaluating a G/2-wide
    # tail must be BIT-identical (padding slots are duplicates of the
    # last valid candidate either way)
    for g in (2, 4, 8, 16):
        out_t = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, mt_group=g, mt_tail=True, interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_t, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} mt_tail mt_group={g}",
            )
    # mask-grouped candidate order: permuting the candidate list must not
    # change any hit (tie-breaks aside, absent in this random scene) —
    # asserted bit-exact here to catch plumbing bugs
    for g in (2, 4):
        out_m = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, mt_group=g, cand_order="mask", interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_m, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} cand_order=mask mt_group={g}",
            )
    # running-best candidate-window prune: skipping windows whose nearest
    # entry exceeds every row's current best can never drop a winner
    # (strict-< RMW; floor-quantised entry only under-estimates) — must
    # be BIT-identical across window modes, incl. the occluded sphere
    # back face behind its front face in this scene
    for g, un, tail in ((8, True, True), (2, False, False)):
        out_pr = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, mt_group=g, mt_union=un, mt_tail=tail,
            mt_prune=True, interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_pr, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} mt_prune g={g} union={un} tail={tail}",
            )
    # phase-1 hierarchy knobs: small supergroups / tight admission caps
    # must not change any hit — tiles admitting more supergroups than
    # p1_super_k overflow to the full hierarchical sweep (p1_super_k=1
    # forces that fallback for most tiles)
    for fanout, superk in ((4, None), (None, 1), (2, 4)):
        out_p = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, p1_fanout=fanout, p1_super_k=superk, interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_p, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} p1_fanout={fanout} p1_super_k={superk}",
            )
    # resident live-cluster pack: windows assemble from a VMEM-resident
    # gathered pack (remapped candidate slots + global-id recovery) and
    # must be BIT-identical; a cap below the live-set size must fall back
    # to the sweep (still identical)
    for cap, g in ((256, 8), (64, 4), (2, 8)):
        out_r = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, mt_group=g, resident_cap=cap, interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_r, f)), np.asarray(getattr(outs[64], f)),
                err_msg=f"{f} resident_cap={cap} mt_group={g}",
            )
    # fine sub-block gating, including sub_tiles=32 whose top block rides
    # the int32 SIGN bit (weights 1<<31; arithmetic-shift extraction)
    for st in (16, 32):
        out_st = closest_hit_clustered(
            o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=64, sub_tiles=st, interpret=True,
        )
        f = np.asarray(outs[64].found)
        np.testing.assert_array_equal(np.asarray(out_st.found), f, err_msg=f"st={st}")
        np.testing.assert_array_equal(np.asarray(out_st.tri)[f], np.asarray(outs[64].tri)[f])
        np.testing.assert_array_equal(np.asarray(out_st.t)[f], np.asarray(outs[64].t)[f])


def test_tile_candidates_match_exact_union():
    """Phase 1 must produce EXACTLY the per-tile union of the kernel's
    per-ray slab test (randomised rays incl. axis-aligned, dead and
    inside-box; sentinel padding boxes excluded)."""
    from rts_tpu.ops.cluster_trace import _BIG, _slab_overlap, _tile_candidates

    rng = np.random.default_rng(3)
    c = 24
    lo = rng.uniform(-200, 200, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(1, 120, (c, 3)).astype(np.float32)
    # sentinel padding boxes
    lo[-2:] = np.inf
    hi[-2:] = np.inf
    mn, mx = jnp.asarray(lo), jnp.asarray(hi)

    rt, st = 64, 4
    l = 192
    o = rng.uniform(-250, 250, (l, 3)).astype(np.float32)
    d = rng.normal(size=(l, 3)).astype(np.float32)
    d[:20, 1:] = 0.0  # axis-aligned
    d[20:30] = 0.0  # dead
    o[30:40] = (lo[0] + hi[0]) / 2  # inside a box
    tmin = np.full(l, 0.005, np.float32)
    o, d, tmin = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin)

    cand, meta, bits, _ent = _tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=c)
    cand, meta, bits = np.asarray(cand), np.asarray(meta), np.asarray(bits)
    assert (meta[:, 1] == 0).all()  # k_max = c can never overflow

    best = jnp.full((l,), _BIG, jnp.float32)
    rs = rt // st
    for t in range(l // rt):
        exact_set = set()
        for ci in range(c):
            ov = np.asarray(_slab_overlap(o, d, tmin, best, mn[ci], mx[ci]))
            tile_ov = ov[t * rt : (t + 1) * rt]
            if tile_ov.any():
                exact_set.add(ci)
                # per-sub-block bitmask must match the exact per-ray union
                slot = list(cand[t, : meta[t, 0]]).index(ci)
                want = sum(
                    (1 << b) for b in range(st) if tile_ov[b * rs : (b + 1) * rs].any()
                )
                assert bits[t, slot] == want, (t, ci)
        assert set(cand[t, : meta[t, 0]].tolist()) == exact_set, t
    # sentinels never appear among candidates
    for t in range(l // rt):
        assert not set(cand[t, : meta[t, 0]]) & {c - 1, c - 2}

    # mask order: a per-tile permutation — same valid set in the first
    # count slots, same (cluster -> bits) association, masks grouped
    cand_m, meta_m, bits_m, _ent_m = (
        np.asarray(a)
        for a in _tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=c, cand_order="mask")
    )
    np.testing.assert_array_equal(meta_m, meta)
    for t in range(l // rt):
        n = meta[t, 0]
        assert set(cand_m[t, :n].tolist()) == set(cand[t, :n].tolist())
        want = dict(zip(cand[t, :n].tolist(), bits[t, :n].tolist()))
        got = dict(zip(cand_m[t, :n].tolist(), bits_m[t, :n].tolist()))
        assert got == want
        assert (np.diff(bits_m[t, :n]) >= 0).all()  # grouped by mask value


def test_p1_level0_identical(monkeypatch):
    """The level-0 culling pass (big scenes, S >= _P1_L0_MIN_S) must
    produce candidate lists IDENTICAL to the dense 2-level build —
    containment guarantees it; the top_k index-ordering keeps even the
    tie-break slot order stable.  Forced on via the threshold."""
    from rts_tpu.ops import cluster_trace as CT

    rng = np.random.default_rng(11)
    c = 96
    lo = rng.uniform(-300, 300, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(1, 100, (c, 3)).astype(np.float32)
    mn, mx = jnp.asarray(lo), jnp.asarray(hi)
    rt, st = 64, 4
    l = 256
    o = rng.uniform(-350, 350, (l, 3)).astype(np.float32)
    d = rng.normal(size=(l, 3)).astype(np.float32)
    d[-8:] = 0.0  # dead lanes
    tmin = jnp.asarray(np.full(l, 0.005, np.float32))
    o, d = jnp.asarray(o), jnp.asarray(d)

    # fanout=2 -> S=48 supergroups; dense path (threshold above S)
    dense = [np.asarray(a) for a in CT._tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=64, p1_fanout=2, p1_super_k=48)]
    # force level 0 on (f0=8 -> S0=6, K0 covers all: no overflow)
    monkeypatch.setattr(CT, "_P1_L0_MIN_S", 8)
    lvl0 = [np.asarray(a) for a in CT._tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=64, p1_fanout=2, p1_super_k=48)]
    for a, b, nm in zip(lvl0, dense, ("cand", "meta", "bits")):
        np.testing.assert_array_equal(a, b, err_msg=nm)
    assert dense[1][:, 0].max() > 2  # non-trivial lists

    # the per-call level-0 knobs must match the module constants they
    # override (p1_fanout0/p1_super_k0 = the defaults -> identical lists)
    kw0 = [np.asarray(a) for a in CT._tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=64, p1_fanout=2, p1_super_k=48,
        p1_fanout0=CT._P1_FANOUT0, p1_super_k0=CT._P1_SUPER_K0)]
    for a, b, nm in zip(kw0, lvl0, ("cand", "meta", "bits")):
        np.testing.assert_array_equal(a, b, err_msg=f"kwargs {nm}")

    # tiny K0 forces level-0 overflow: flagged, never silently wrong
    # (via the per-call knob and via the module constant)
    overk = [np.asarray(a) for a in CT._tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=64, p1_fanout=2, p1_super_k=48,
        p1_super_k0=1)]
    assert overk[1][:, 1].any()
    monkeypatch.setattr(CT, "_P1_SUPER_K0", 1)
    over = [np.asarray(a) for a in CT._tile_candidates(o.T, d.T, tmin, mn, mx, rt, st, k_max=64, p1_fanout=2, p1_super_k=48)]
    assert over[1][:, 1].any()  # overflow flag set somewhere
    np.testing.assert_array_equal(overk[1], over[1])


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_fuzz_candidates_vs_bruteforce(seed):
    """Randomized scenes + ray soups: candidate traversal must match the
    dense reference exactly (found/tri/t), at any cluster fill level."""
    rng = np.random.default_rng(seed)
    meshes, centres = [], []
    for _ in range(rng.integers(2, 5)):
        if rng.random() < 0.5:
            m, _ = sphere_mesh(int(rng.integers(1, 3)), rng.uniform(10, 60))
        else:
            m = rect_mesh(
                rng.uniform(1, 6), rng.uniform(40, 160), rng.uniform(40, 160),
                yaw=rng.uniform(-0.8, 0.8), pitch=rng.uniform(-0.8, 0.8),
            )
        pos = [rng.uniform(-400, 1200), rng.uniform(-400, 400), rng.uniform(-200, 200)]
        meshes.append(m.translated(pos))
        centres.append(pos)
    scene = compile_scene(meshes, [0.9] * len(meshes), [1.0] * len(meshes))
    scene = cluster_reorder(scene, cluster_size=CS)
    dev = scene_to_device(scene, dtype=jnp.float32)
    centres = np.asarray(centres)

    l = 2 * RT
    # half the rays aim from random origins at random target CENTRES
    # (with jitter) so hits are guaranteed; the rest are a random soup
    o = rng.uniform(-500, 1300, (l, 3)).astype(np.float32)
    d = rng.normal(size=(l, 3)).astype(np.float32)
    aim = centres[rng.integers(0, len(centres), l // 2)]
    aim = aim + rng.uniform(-5, 5, aim.shape)
    d[: l // 2] = (aim - o[: l // 2]).astype(np.float32)
    d[-16:] = 0.0  # dead lanes
    d[l // 2 : l // 2 + 8, 1:] = 0.0  # axis-aligned
    tmin = np.full(l, 0.005, np.float32)
    o, dj, tm = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin)

    ref = closest_hit_bruteforce(
        o, dj, tm, dev.tri_p0, dev.tri_e0, dev.tri_e1, dev.tri_n,
        dev.tri_c1, dev.tri_c0, dev.tri_np0, tri_chunk=128,
    )
    got = run_clustered(dev, o, dj, tm)
    np.testing.assert_array_equal(np.asarray(got.found), np.asarray(ref.found))
    f = np.asarray(ref.found)
    assert f.sum() > 10
    np.testing.assert_array_equal(np.asarray(got.tri)[f], np.asarray(ref.tri)[f])
    np.testing.assert_allclose(np.asarray(got.t)[f], np.asarray(ref.t)[f], rtol=1e-6)


def test_f64_inputs_narrow_conservatively():
    """float64 scenes exercise the outward box narrowing: the clustered
    kernel must still find every hit the f64 brute reference finds."""
    scene = make_scene()
    dev = scene_to_device(scene, dtype=jnp.float64)
    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    assert mn.dtype == jnp.float64
    pack = pack_tri_fields(dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0)
    o, d, tm = _random_rays(seed=5)
    o, d, tm = o.astype(jnp.float64), d.astype(jnp.float64), tm.astype(jnp.float64)

    ref = closest_hit_bruteforce(
        o.astype(jnp.float32), d.astype(jnp.float32), tm.astype(jnp.float32),
        *(a.astype(jnp.float32) for a in (dev.tri_p0, dev.tri_e0, dev.tri_e1, dev.tri_n,
                                          dev.tri_c1, dev.tri_c0)), dev.tri_np0.astype(jnp.float32),
        tri_chunk=64,
    )
    got = closest_hit_clustered(
        o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT, candidates=64, interpret=True
    )
    # the kernel computes in f32 internally; culling must not lose hits
    f = np.asarray(ref.found)
    assert f.sum() > 15
    np.testing.assert_array_equal(np.asarray(got.found), f)
    np.testing.assert_array_equal(np.asarray(got.tri)[f], np.asarray(ref.tri)[f])


def test_grid_chunking_identical(monkeypatch):
    """Forcing a tiny SMEM list budget must chunk the grid into multiple
    pallas_calls with identical results."""
    import rts_tpu.ops.cluster_trace as ct

    scene = make_scene()
    dev = scene_to_device(scene, dtype=jnp.float32)
    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    pack = pack_tri_fields(dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0)
    o, d, tm = _random_rays(l=4 * RT)

    whole = closest_hit_clustered(
        o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT, candidates=16, interpret=True
    )
    # (16+2)*4 = 72 bytes/tile; budget 80 -> 1 tile per chunk (4 chunks)
    monkeypatch.setattr(ct, "_SMEM_LIST_BUDGET", 80)
    ct.closest_hit_clustered.clear_cache()
    chunked = closest_hit_clustered(
        o, d, tm, pack, mn, mx, cluster_size=CS, ray_tile=RT, candidates=16, interpret=True
    )
    ct.closest_hit_clustered.clear_cache()
    for name in ("t", "tri", "beta", "gamma", "found"):
        np.testing.assert_array_equal(
            np.asarray(getattr(whole, name)), np.asarray(getattr(chunked, name)), err_msg=name
        )


def test_supergroup_overflow_flags_tiles():
    """A ray set overlapping more supergroups than the level-1 budget
    must flag the tile (kernel falls back to the sweep), never silently
    drop clusters."""
    from rts_tpu.ops.cluster_trace import _P1_FANOUT, _P1_SUPER_K, _tile_candidates

    # a long row of small boxes along +x: one per cluster, so a ray down
    # the row overlaps every supergroup
    c = _P1_FANOUT * (_P1_SUPER_K + 4)
    xs = np.arange(c, dtype=np.float32) * 10.0
    mn = np.stack([xs, np.full(c, -1.0), np.full(c, -1.0)], axis=1)
    mx = np.stack([xs + 5.0, np.full(c, 1.0), np.full(c, 1.0)], axis=1)

    l = 64
    o = np.tile(np.asarray([[-10.0, 0.0, 0.0]], np.float32), (l, 1))
    d = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (l, 1))
    tmin = np.full(l, 0.005, np.float32)
    cand, meta, _bits, _e = _tile_candidates(
        jnp.asarray(o.T), jnp.asarray(d.T), jnp.asarray(tmin),
        jnp.asarray(mn), jnp.asarray(mx), l, 4, k_max=64,
    )
    meta = np.asarray(meta)
    assert meta[0, 1] == 1  # flagged for the sweep

    # perpendicular rays seeing only the first box: not flagged, exact
    d2 = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (l, 1))
    o2 = np.tile(np.asarray([[2.0, -5.0, 0.0]], np.float32), (l, 1))
    cand2, meta2, _b2, _e2 = _tile_candidates(
        jnp.asarray(o2.T), jnp.asarray(d2.T), jnp.asarray(tmin),
        jnp.asarray(mn), jnp.asarray(mx), l, 4, k_max=64,
    )
    cand2, meta2 = np.asarray(cand2), np.asarray(meta2)
    assert meta2[0, 1] == 0 and meta2[0, 0] == 1 and cand2[0, 0] == 0


def test_corner_refit_conservative_and_used():
    """animate_packed's corner-transform refit must produce boxes that
    contain every animated vertex of their cluster (for random rigid
    motions), and all-padding clusters must keep the [+inf,+inf] sentinel."""
    from rts_tpu.engine.animate import animate_packed, scene_base

    scene = make_scene()
    base = scene_base(scene, dtype=jnp.float32, cluster_size=CS)
    assert base.cl_mn is not None

    rng = np.random.default_rng(7)
    nt = base.num_targets
    # random rotations via QR
    q, _ = np.linalg.qr(rng.normal(size=(nt, 3, 3)))
    pos = rng.uniform(-500, 500, (nt, 3))
    vel = np.zeros((nt, 3))
    sc = animate_packed(
        base, jnp.asarray(q, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.asarray(vel, jnp.float32), CS,
    )
    mn = np.asarray(sc.aabb_mn)
    mx = np.asarray(sc.aabb_mx)

    # animated vertices straight from the base soup (f64 ground truth)
    tid = np.clip(np.asarray(base.tri_target), 0, nt - 1)
    tv = np.asarray(base.tri_verts, np.float64)  # [T, 3, 3]
    verts = np.einsum("tij,tcj->tci", q[tid], tv) + np.where(
        (np.asarray(base.tri_target) >= 0)[:, None, None], pos[tid][:, None, :], 0.0
    )
    c = tv.shape[0] // CS
    pad = (np.asarray(base.tri_target) < 0).reshape(c, CS)
    v = verts.reshape(c, CS, 3, 3)
    for ci in range(c):
        real = ~pad[ci]
        if not real.any():
            assert np.isinf(mn[ci]).all() and np.isinf(mx[ci]).all()
            continue
        vmin = v[ci][real].min(axis=(0, 1))
        vmax = v[ci][real].max(axis=(0, 1))
        assert (mn[ci] <= vmin + 1e-5).all(), ci
        assert (mx[ci] >= vmax - 1e-5).all(), ci


def test_fan_tiling_permutation_roundtrip():
    """num_rays > 4 engages Morton fan tiling; results must land back in
    the reference launch order (vs brute force, incl. refraction slots)."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.engine.fan import fan_tile_perm
    from rts_tpu.sim import prepare_cpi
    from test_driver import make_world

    perm = fan_tile_perm(5)
    assert sorted(perm.tolist()) == list(range(125))
    perm2 = fan_tile_perm(5, "morton2")
    assert sorted(perm2.tolist()) == list(range(125))
    # morton2 keeps ix (launch-range axis) minor: the first N entries of
    # the permutation are one (iy, iz) cell's full ix run
    first = np.sort(perm2[:5])
    assert (first % 5 == np.arange(5)).all() and len(set(first // 5)) == 1

    w = make_world(num_pulses=1)
    w.targets[0].refl_coeff = 0.6
    w.targets[0].refr_index = 1.5
    params = Parameters(num_rays=5, max_refl_depth=2, max_refr_depth=2)
    b1, batch1, cfg1, spec1 = prepare_cpi(w, params, dtype=jnp.float32)
    brute = trace_cpi(b1, batch1, cfg1, spec1)
    import dataclasses

    b2, batch2, cfg2, spec2 = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=CS, ray_tile=RT, interpret=True
    )
    for order in ("morton3", "morton2"):
        cfgo = dataclasses.replace(cfg2, fan_order=order)
        clus = trace_cpi(b2, batch2, cfgo, spec2)
        np.testing.assert_array_equal(np.asarray(clus.received), np.asarray(brute.received))
        f = np.asarray(brute.received) >= 0
        assert f.sum() > 0
        np.testing.assert_allclose(
            np.asarray(clus.agg.delay)[f], np.asarray(brute.agg.delay)[f], rtol=1e-6
        )


def test_cpi_clustered_refraction():
    """Dielectric multi-bounce through the ClusterScene path (interpret)."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi
    from test_driver import make_world

    w = make_world(num_pulses=2, rotating=True)
    w.targets[0].refl_coeff = 0.6
    w.targets[0].refr_index = 1.5
    params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
    b1, batch1, cfg1, spec1 = prepare_cpi(w, params, dtype=jnp.float32)
    brute = trace_cpi(b1, batch1, cfg1, spec1)
    b2, batch2, cfg2, spec2 = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=CS, ray_tile=RT, interpret=True
    )
    clus = trace_cpi(b2, batch2, cfg2, spec2)
    np.testing.assert_array_equal(np.asarray(clus.received), np.asarray(brute.received))
    np.testing.assert_array_equal(np.asarray(clus.agg.emit), np.asarray(brute.agg.emit))
    f = np.asarray(brute.received) >= 0
    assert f.sum() > 0
    np.testing.assert_allclose(np.asarray(clus.power)[f], np.asarray(brute.power)[f], rtol=5e-4)


def test_cpi_clustered_end_to_end():
    """Full pipeline with accel='cluster' (interpret) vs brute, f32."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi
    from test_driver import make_world

    w = make_world(num_pulses=2)
    params = Parameters(num_rays=3, max_refl_depth=2)
    b1, batch1, cfg1, spec1 = prepare_cpi(w, params, dtype=jnp.float32)
    brute = trace_cpi(b1, batch1, cfg1, spec1)
    b2, batch2, cfg2, spec2 = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=CS, ray_tile=RT, interpret=True
    )
    clus = trace_cpi(b2, batch2, cfg2, spec2)
    np.testing.assert_array_equal(np.asarray(clus.received), np.asarray(brute.received))
    f = np.asarray(brute.received) >= 0
    np.testing.assert_allclose(
        np.asarray(clus.power)[f], np.asarray(brute.power)[f], rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(clus.agg.delay)[f], np.asarray(brute.agg.delay)[f], rtol=1e-6
    )


def test_compact_lanes_identical():
    """Opt-in lane compaction must not change any result."""
    import dataclasses

    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi
    from test_driver import make_world

    w = make_world(num_pulses=1)
    w.targets[0].refl_coeff = 0.6
    w.targets[0].refr_index = 1.5
    params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
    base, batch, cfg, spec = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=CS, ray_tile=RT, interpret=True
    )
    plain = trace_cpi(base, batch, cfg, spec)
    compact = trace_cpi(base, batch, dataclasses.replace(cfg, compact_lanes=True), spec)
    for name in ("power", "doppler", "delay", "received"):
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)), np.asarray(getattr(compact, name)), err_msg=name
        )
    np.testing.assert_array_equal(np.asarray(plain.agg.emit), np.asarray(compact.agg.emit))
