"""End-to-end driver tests: World -> run() -> Response, vs analytic values.

Mirrors the reference's single entry-point flow ``rs::RTS(world, ...)``
(ray_tracer.cpp:509-1363): scene rebuild per pulse, trace, post-process,
aggregate, responses attached to receivers.
"""

import numpy as np

from rts_tpu import Parameters
from rts_tpu.sim import (
    AttitudePath,
    Path,
    RadarSignal,
    Receiver,
    Target,
    Transmitter,
    World,
    run,
)

C = 299792458.0
CARRIER = 10e9


def make_world(num_pulses=1, target_speed=None, rotating=False):
    w = World()
    w.add(
        Transmitter(
            name="tx0",
            path=Path.fixed(0, 0, 0),
            wave=RadarSignal(carrier=CARRIER, temperature=30.0),
            pulse_count=num_pulses,
            prf=1000.0,
            tx_span=(0.1, 0.1, 0.0),
        )
    )
    w.add(
        Receiver(
            name="rx0",
            path=Path.fixed(0, 0, 0),
            sphere=(5.0, 1.0, 1.0),
            noise_temperature=70.0,
        )
    )
    if target_speed is not None:
        tpath = Path.linear([(0.0, (1000.0, 0.0, 0.0)), (1.0, (1000.0 + target_speed, 0.0, 0.0))])
    else:
        tpath = Path.fixed(1000, 0, 0)
    att = AttitudePath(yaw_rate=0.1) if rotating else AttitudePath()
    w.add(
        Target(
            name="plate",
            path=tpath,
            attitude=att,
            shape="rect",
            rect=(2.0, 200.0, 200.0),
            refl_coeff=0.9,
        )
    )
    return w


class TestMonostaticPlate:
    def test_boresight_analytic(self):
        """Single boresight ray: exact radar-equation power, delay, phase.

        Plate spans x in [999, 1001]; capture point is the back of the rx
        sphere (the origin), so both legs are 999 m.
        """
        w = make_world()
        s = run(w, Parameters(num_rays=1, max_refl_depth=2))
        assert s.total_received == 1
        rx = w.receivers[0]
        assert len(rx.responses) == 1
        p = rx.responses[0].points[0]

        expected_delay = (999.0 + 999.0) / C
        assert abs(p.delay - expected_delay) < 1e-15

        wl = C / CARRIER
        r1 = r2 = 999.0
        exp_power = (1 / (4 * np.pi * r1**2)) * 0.9 * (1 / ((4 * np.pi) ** 2 * r2**2)) * wl**2
        np.testing.assert_allclose(p.power, exp_power, rtol=1e-12)

        exp_phase = -np.mod(p.delay * 2 * np.pi * CARRIER, 2 * np.pi)
        assert abs(p.phase - exp_phase) < 1e-9
        assert p.doppler == 0.0
        # accumulated quirk: wave temp (30) + rx temp (70) (ray_tracer.cpp:829)
        assert p.noise_temperature == 100.0
        assert abs(p.time - (0.0 + p.delay)) < 1e-18

    def test_fan_aggregates_to_one_response(self):
        """27-ray fan, all same path -> coherently combined single response."""
        w = make_world()
        s = run(w, Parameters(num_rays=3, max_refl_depth=2))
        assert s.total_received == 3  # window admits 3 of 27
        assert s.total_responses == 1

    def test_doppler_receding(self):
        speed = 100.0  # m/s receding along +x
        w = make_world(target_speed=speed)
        run(w, Parameters(num_rays=1, max_refl_depth=2))
        p = w.receivers[0].responses[0].points[0]
        vr = -speed  # dot(V, k1-k0)/2 with k0=+x, k1=-x
        exp_fd = CARRIER * ((1 + vr / C) / (1 - vr / C) - 1)
        np.testing.assert_allclose(p.doppler, exp_fd, rtol=1e-9)

    def test_cpi_multiple_pulses(self):
        w = make_world(num_pulses=4, rotating=True)
        s = run(w, Parameters(num_rays=3, max_refl_depth=2))
        assert len(s.pulses) == 4
        assert all(p.received_rays > 0 for p in s.pulses)

    def test_refraction_multistatic(self):
        w = make_world()
        w.targets[0].refl_coeff = 0.6
        w.targets[0].refr_index = 1.5
        w.add(Receiver(name="rx1", path=Path.fixed(0, 200, 0), sphere=(5.0, 1.5, 1.5)))
        s = run(w, Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2))
        assert s.total_received > 0
        assert s.total_responses > 0

    def test_empty_scene(self):
        w = World()
        w.add(Transmitter(wave=RadarSignal(carrier=CARRIER), pulse_count=1))
        w.add(Receiver(path=Path.fixed(0, 0, 0)))
        s = run(w, Parameters(num_rays=2, max_refl_depth=1))
        assert s.total_responses == s.total_received >= 0


def test_driver_clustered_accel_matches_brute():
    """Sequential driver with accel='cluster' (interpret) == brute, f32."""
    import copy

    import jax.numpy as jnp

    from rts_tpu.sim import run as _run

    w1 = make_world(num_pulses=2)
    w2 = copy.deepcopy(w1)
    params = Parameters(num_rays=3, max_refl_depth=2)
    _run(w1, params, dtype=jnp.float32)
    _run(w2, params, dtype=jnp.float32, accel="cluster", cluster_size=128, interpret=True)
    p1 = [p for rx in w1.receivers for r in rx.responses for p in r.points]
    p2 = [p for rx in w2.receivers for r in rx.responses for p in r.points]
    assert len(p1) == len(p2) > 0
    for a, b in zip(sorted(p1, key=lambda p: p.delay), sorted(p2, key=lambda p: p.delay)):
        np.testing.assert_allclose(a.power, b.power, rtol=5e-5)
        np.testing.assert_allclose(a.delay, b.delay, rtol=1e-6)


def test_target_file_shape_end_to_end(tmp_path):
    """shape='file' target through the full sim pipeline."""
    from rts_tpu.geometry import rect_mesh, write_mesh_files

    mesh = rect_mesh(2.0, 200.0, 200.0)
    vf, nf = str(tmp_path / "v.txt"), str(tmp_path / "n.txt")
    write_mesh_files(mesh, vf, nf)

    w = make_world()
    w.targets[0] = Target(
        name="fileplate", shape="file", files=(vf, nf),
        path=Path.fixed(1000, 0, 0), refl_coeff=0.9,
    )
    s = run(w, Parameters(num_rays=1, max_refl_depth=2))
    assert s.total_received == 1
    p = w.receivers[0].responses[0].points[0]
    np.testing.assert_allclose(p.delay, 2 * 999.0 / C, rtol=1e-12)


def test_analytic_rcs_models():
    """Sphere/plate RCS models scale received power as expected."""
    from rts_tpu.physics.rcs import PlateRCS, SphereRCS
    import copy

    w_iso = make_world()
    w_sph = copy.deepcopy(w_iso)
    w_sph.targets[0].rcs_model = SphereRCS(radius=2.0)
    params = Parameters(num_rays=1, max_refl_depth=2)
    run(w_iso, params)
    run(w_sph, params)
    p_iso = w_iso.receivers[0].responses[0].points[0].power
    p_sph = w_sph.receivers[0].responses[0].points[0].power
    np.testing.assert_allclose(p_sph / p_iso, np.pi * 4.0, rtol=1e-9)

    # plate at broadside (half-angle sums ~ pi: arrival/departure reversed)
    pl = PlateRCS(width=2.0, height=3.0)
    wl = C / CARRIER
    peak = float(np.asarray(pl.rcs(0.0, 0.0, wl)))
    np.testing.assert_allclose(peak, 4 * np.pi * 36.0 / wl**2)


def test_many_targets_gather_fallback():
    """> 16 targets exercises the direct-gather branch of per-lane target
    attribute lookup (the one-hot path is gated to small target counts)."""
    w = World()
    w.add(
        Transmitter(
            path=Path.fixed(0, 0, 0),
            wave=RadarSignal(carrier=CARRIER),
            pulse_count=1,
            tx_span=(0.3, 0.3, 0.0),
        )
    )
    w.add(Receiver(path=Path.fixed(0, 0, 0), sphere=(5.0, 1.2, 1.2)))
    # 20 small plates fanned out; the boresight one reflects back
    for k in range(20):
        y = (k - 10) * 40.0
        w.add(
            Target(
                name=f"p{k}",
                shape="rect",
                rect=(2.0, 30.0, 30.0),
                path=Path.fixed(1000.0, y, 0.0),
                refl_coeff=0.5 + 0.02 * k,
            )
        )
    s = run(w, Parameters(num_rays=1, max_refl_depth=2))
    assert s.total_received == 1
    p = w.receivers[0].responses[0].points[0]
    # boresight hits target k=10 (y=0): refl 0.7
    wl = C / CARRIER
    exp = (1 / (4 * np.pi * 999.0**2)) * 0.7 * (1 / ((4 * np.pi) ** 2 * 999.0**2)) * wl**2
    np.testing.assert_allclose(p.power, exp, rtol=1e-9)
