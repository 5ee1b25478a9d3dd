"""Terrain heightfield generator + end-to-end occlusion behavior."""

import numpy as np

from rts_tpu import Parameters
from rts_tpu.geometry import terrain_mesh
from rts_tpu.sim import Path, RadarSignal, Receiver, Target, Transmitter, World, run


def test_counts_and_normals():
    n = 33
    m = terrain_mesh(n, 1000.0, 80.0, seed=1)
    assert m.num_verts == n * n
    assert m.num_tris == 2 * (n - 1) ** 2
    np.testing.assert_allclose(np.linalg.norm(m.normals, axis=1), 1.0, rtol=1e-12)
    assert m.verts[:, 2].min() >= 0.0
    assert m.verts[:, 2].max() <= 80.0 + 1e-9


def test_flat_terrain_specular_return():
    """A zero-height terrain is a flat plate: nadir-looking monostatic
    radar gets a specular return at 2h/c."""
    w = World()
    h = 500.0
    w.add(
        Transmitter(
            path=Path.fixed(0, 0, h),
            rotation=__import__("rts_tpu.sim", fromlist=["RotationPath"]).RotationPath(elevation=-np.pi / 2),
            wave=RadarSignal(carrier=10e9),
            pulse_count=1,
            tx_span=(0.05, 0.05, 0.0),
        )
    )
    w.add(
        Receiver(
            path=Path.fixed(0, 0, h),
            rotation=__import__("rts_tpu.sim", fromlist=["RotationPath"]).RotationPath(elevation=-np.pi / 2),
            sphere=(5.0, 1.0, 1.0),
        )
    )
    w.add(
        Target(
            shape="terrain",
            terrain=(17, 400.0, 0.0, 0),
            path=Path.fixed(0, 0, 0),
            refl_coeff=1.0,
        )
    )
    s = run(w, Parameters(num_rays=1, max_refl_depth=2))
    assert s.total_received == 1
    p = w.receivers[0].responses[0].points[0]
    c = 299792458.0
    np.testing.assert_allclose(p.delay, 2 * h / c, rtol=1e-12)


def test_terrain_occludes_target():
    """A ridge between radar and target shadows it (config 4 occlusion)."""
    from rts_tpu.sim import RotationPath

    def world_with(peak):
        w = World()
        w.add(
            Transmitter(
                path=Path.fixed(0, 0, 50.0),
                wave=RadarSignal(carrier=10e9),
                pulse_count=1,
                tx_span=(0.02, 0.02, 0.0),
            )
        )
        w.add(Receiver(path=Path.fixed(0, 0, 50.0), sphere=(5.0, 1.0, 1.0)))
        heights = np.zeros((17, 17))
        heights[8, :] = 1.0  # ridge across the x midline
        t = Target(
            name="ridge",
            shape="terrain",
            terrain=(17, 800.0, peak, 0),
            path=Path.fixed(500.0, 0.0, 0.0),
            refl_coeff=1.0,
        )
        # inject deterministic ridge heights
        from rts_tpu.geometry import terrain_mesh as tm

        t.base_mesh = lambda strict_parity=True: tm(17, 800.0, peak, heights=heights)
        w.add(t)
        w.add(
            Target(
                name="plate",
                shape="rect",
                rect=(2.0, 100.0, 100.0),
                path=Path.fixed(2000.0, 0.0, 50.0),
                refl_coeff=1.0,
            )
        )
        return w

    # low ridge: boresight reaches the distant plate; high ridge blocks it
    w_lo, w_hi = world_with(1.0), world_with(400.0)
    lo = run(w_lo, Parameters(num_rays=1, max_refl_depth=2))
    run(w_hi, Parameters(num_rays=1, max_refl_depth=2))
    assert lo.total_received >= 1
    c = 299792458.0
    lo_delays = [p.delay for r in w_lo.receivers[0].responses for p in r.points]
    hi_delays = [p.delay for r in w_hi.receivers[0].responses for p in r.points]
    plate_delay = 2 * 1999.0 / c  # plate front face at x = 1999
    assert any(abs(d - plate_delay) < 1e-8 for d in lo_delays), lo_delays
    assert all(abs(d - plate_delay) > 1e-8 for d in hi_delays), hi_delays


def test_million_tri_terrain_host_build():
    """Host-side 1M-triangle terrain compile stays fast (config 4 scale)."""
    import time

    from rts_tpu.accel import cluster_reorder
    from rts_tpu.geometry.scene import compile_scene

    t0 = time.perf_counter()
    m = terrain_mesh(708, 20000.0, 300.0, seed=3)
    scene = compile_scene([m], [1.0], [1.0])
    scene = cluster_reorder(scene, cluster_size=256)
    dt = time.perf_counter() - t0
    assert m.num_tris == 2 * 707 * 707  # 999,698 tris
    assert scene.tri_verts.shape[0] % 256 == 0
    assert dt < 60.0, f"host build too slow: {dt:.1f}s"
