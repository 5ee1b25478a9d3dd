"""Tile-granular narrow late segments (TraceConfig.compact_narrow).

Narrow segments gather live ray tiles into a static narrow block and
scatter results back; tile membership is preserved, so every TraceResult
field must be BIT-identical to the full-width trace — both when the
narrow branch fires (few live tiles) and when the lax.cond falls back to
full width (too many live tiles).
"""

import jax.numpy as jnp
import numpy as np

from rts_tpu.config import Parameters
from rts_tpu.engine import RxGeomDevice, TraceConfig, scene_to_device, trace_pulse
from rts_tpu.geometry import sphere_mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.physics import rx_sphere_geometry

RT = 128
NARROW = 2


def monostatic_rx(radius=5.0):
    return rx_sphere_geometry(
        rx_pos=np.zeros((1, 3)),
        rx_azimuth=np.array([0.0]),
        rx_elevation=np.array([0.0]),
        sphere_radius=np.array([radius]),
        theta_span=np.array([1.0]),
        phi_span=np.array([1.0]),
    )


def run_engine(scene, params, narrow, rt=RT):
    cfg = TraceConfig.from_parameters(
        params, accel="cluster", cluster_size=64, ray_tile=rt,
        interpret=True, compact_narrow=narrow,
    )
    dev = scene_to_device(scene, dtype=jnp.float32)
    rx = RxGeomDevice.from_host(monostatic_rx(), dtype=jnp.float32)
    return trace_pulse(
        dev, rx, jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        (0.0, 0.0), (0.1, 0.1, 0.0), cfg,
    )


def assert_bit_identical(a, b):
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
        )


class TestNarrowSegments:
    def test_narrow_fires_bit_identical(self):
        """Plate subtending ~1 ray spacing of a 9^3 fan: only a handful
        of primaries survive segment 1, so the live tiles provably fit
        the ceil(tiles/2) budget and the narrow branch fires."""
        mesh, _ = sphere_mesh(2, 7.0)
        scene = compile_scene(
            [mesh.translated([1000.0, 0.0, 0.0])], [0.9], [1.0], [np.array([40.0, 5.0, 0.0])]
        )
        params = Parameters(num_rays=9, max_refl_depth=2)
        ref = run_engine(scene, params, 0)
        nar = run_engine(scene, params, NARROW)
        assert_bit_identical(ref, nar)
        # the narrow branch fired iff live tiles fit the budget; live
        # lanes at every post-spawn segment are a subset of segment-1
        # hitters (refl_depth >= 1 — it only grows on hits)
        refl = np.asarray(ref.refl_depth) >= 1
        assert refl.sum() >= 1
        n3 = 9**3
        tiles_full = n3 // RT
        nt = -(-tiles_full // NARROW)
        live_tiles = np.unique(np.nonzero(refl[: tiles_full * RT])[0] // RT)
        assert 1 <= len(live_tiles) <= nt, (
            f"test scene no longer collapses ({len(live_tiles)} live tiles "
            f"vs budget {nt}) — shrink the plate"
        )

    def test_wide_fallback_bit_identical(self):
        """Huge plate: every tile keeps live lanes, the cond takes the
        full-width branch — still identical."""
        mesh, _ = sphere_mesh(2, 80.0)
        scene = compile_scene(
            [mesh.translated([400.0, 0.0, 0.0])], [0.9], [1.0], [np.array([40.0, 5.0, 0.0])]
        )
        params = Parameters(num_rays=9, max_refl_depth=2)
        ref = run_engine(scene, params, 0)
        nar = run_engine(scene, params, NARROW)
        assert_bit_identical(ref, nar)
        refl = np.asarray(ref.refl_depth) >= 1
        n3 = 9**3
        tiles_full = n3 // RT
        nt = -(-tiles_full // NARROW)
        live_tiles = np.unique(np.nonzero(refl[: tiles_full * RT])[0] // RT)
        assert len(live_tiles) > nt  # sanity: this case exercises the fallback

    def test_auto_narrow_bit_identical(self):
        """compact_narrow=-1 picks the live-tile budget from the tile
        count (max(8, tiles//24)); rt=32 gives 22 full tiles so the
        narrow branch provably fires (budget 8 < 22) on the collapsing
        scene — results must stay bit-identical."""
        mesh, _ = sphere_mesh(2, 7.0)
        scene = compile_scene(
            [mesh.translated([1000.0, 0.0, 0.0])], [0.9], [1.0], [np.array([40.0, 5.0, 0.0])]
        )
        params = Parameters(num_rays=9, max_refl_depth=2)
        ref = run_engine(scene, params, 0, rt=32)
        nar = run_engine(scene, params, -1, rt=32)
        assert_bit_identical(ref, nar)
        refl = np.asarray(ref.refl_depth) >= 1
        live_tiles = np.unique(np.nonzero(refl[: (9**3 // 32) * 32])[0] // 32)
        assert 1 <= len(live_tiles) <= 8, "scene no longer collapses for the auto budget"

    def test_combo_features_bit_identical(self):
        """narrow + mt_tail TOGETHER over a multi-pulse CPI must stay
        bit-identical to the plain engine (flag interactions share the
        tile gather/scatter machinery).  The third r3 flag this combo
        test once covered, shade_gather='window', was excised in r4
        (measured −3% in situ + a TPU backend miscompile with narrow —
        docs/PERF.md 'r3j combo bisect')."""
        from rts_tpu.sim.cpi import prepare_cpi, trace_cpi
        from test_driver import make_world

        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=3)
        kw = dict(
            dtype=jnp.float32, accel="cluster", cluster_size=64,
            ray_tile=32, mt_group=4, interpret=True,
        )
        b0, batch0, cfg0, spec0 = prepare_cpi(w, params, **kw)
        ref = trace_cpi(b0, batch0, cfg0, spec0)
        b1, batch1, cfg1, spec1 = prepare_cpi(
            w, params, compact_narrow=2, mt_tail=True, **kw,
        )
        combo = trace_cpi(b1, batch1, cfg1, spec1)
        got = np.asarray(ref.received) >= 0
        assert got.sum() > 0, "weak scene — no receptions"
        for name in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(combo, name)),
                err_msg=name,
            )

    def test_narrow_with_refraction(self):
        """Dielectric slab: children spawn in segments 1-2; narrow
        segments start after and must skip the inert spawn machinery
        while staying bit-identical (lanes = 3*n3 here)."""
        mesh, _ = sphere_mesh(2, 7.0)
        scene = compile_scene(
            [mesh.translated([1000.0, 0.0, 0.0])], [0.6], [1.5], [np.array([40.0, 5.0, 0.0])]
        )
        params = Parameters(num_rays=9, max_refl_depth=2, max_refr_depth=2)
        ref = run_engine(scene, params, 0)
        nar = run_engine(scene, params, NARROW)
        assert_bit_identical(ref, nar)
