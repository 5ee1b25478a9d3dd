"""Engine-vs-oracle: the vectorised JAX wavefront tracer must reproduce the
NumPy float64 oracle ray-by-ray (SURVEY.md §4 item 3).

Both sides run in float64 on CPU (x64 enabled in conftest) with the
float32 parity narrowings OFF: under strict_parity both compute bounce
directions in float32, where XLA's FMA contraction vs NumPy's separate
multiply+add makes results differ by ~1 ulp(f32) — an ambiguity the
CUDA reference itself has across GPUs (fmaf contraction is compiler
discretion), amplified to metres over an Earth-radius leg.  Pure-f64
comparison pins the *semantics* to ~1e-12; a separate strict-parity test
asserts the documented float32 floor.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rts_tpu.config import Parameters
from rts_tpu.engine import RxGeomDevice, TraceConfig, scene_to_device, trace_pulse
from rts_tpu.geometry import rect_mesh, sphere_mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.oracle import trace_pulse as oracle_trace
from rts_tpu.physics import rx_sphere_geometry

RTOL = 1e-9


def run_both(scene, params, tx_origin, tx_dir, tx_span, rx, strict=False):
    o = oracle_trace(scene, params, tx_origin, tx_dir, tx_span, rx, strict_parity=strict)
    cfg = TraceConfig.from_parameters(params, strict_parity=strict, tri_chunk=64)
    dev_scene = scene_to_device(scene, dtype=jnp.float64)
    dev_rx = RxGeomDevice.from_host(rx, dtype=jnp.float64)
    e = trace_pulse(
        dev_scene,
        dev_rx,
        jnp.asarray(tx_origin, jnp.float64),
        tuple(float(x) for x in tx_dir),
        tuple(float(x) for x in tx_span),
        cfg,
    )
    return o, e


def assert_match(o, e, *, check_rcs=True):
    # The engine keeps lanes on the LAST axis of every leaf ([3, R]
    # vectors, [D, R] path, [2, D, R] rcs); the oracle speaks the
    # reference's row layout — transpose engine outputs for comparison.
    np.testing.assert_array_equal(np.asarray(e.received), o.received, err_msg="received")
    np.testing.assert_array_equal(np.asarray(e.refl_depth), o.refl_depth, err_msg="refl_depth")
    np.testing.assert_array_equal(np.asarray(e.refr_depth), o.refr_depth, err_msg="refr_depth")
    np.testing.assert_array_equal(np.asarray(e.path).T, o.path, err_msg="path")
    np.testing.assert_allclose(np.asarray(e.ray_length), o.ray_length, rtol=RTOL, atol=1e-9, err_msg="ray_length")
    np.testing.assert_allclose(np.asarray(e.power), o.power, rtol=RTOL, atol=1e-300, err_msg="power")
    np.testing.assert_allclose(np.asarray(e.doppler), o.doppler, rtol=RTOL, atol=1e-9, err_msg="doppler")
    np.testing.assert_allclose(np.asarray(e.first_hit).T, o.first_hit, rtol=RTOL, atol=1e-9, err_msg="first_hit")
    np.testing.assert_allclose(np.asarray(e.prev_hit).T, o.prev_hit, rtol=RTOL, atol=1e-9, err_msg="prev_hit")
    if check_rcs:
        np.testing.assert_allclose(
            np.transpose(np.asarray(e.rcs), (2, 1, 0)), o.rcs_angle, rtol=RTOL, atol=1e-9, err_msg="rcs"
        )


def monostatic_rx(radius=5.0):
    return rx_sphere_geometry(
        rx_pos=np.zeros((1, 3)),
        rx_azimuth=np.array([0.0]),
        rx_elevation=np.array([0.0]),
        sphere_radius=np.array([radius]),
        theta_span=np.array([1.0]),
        phi_span=np.array([1.0]),
    )


class TestPlateMonostatic:
    def test_single_ray(self):
        mesh = rect_mesh(2.0, 200.0, 200.0).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [0.9], [1.0], [np.array([50.0, 10.0, 0.0])])
        params = Parameters(num_rays=1, max_refl_depth=2)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], monostatic_rx())
        assert o.received[0] == 0  # sanity: something was traced
        assert_match(o, e)

    def test_fan_27_rays(self):
        mesh = rect_mesh(2.0, 400.0, 400.0).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.array([-100.0, 0.0, 0.0])])
        params = Parameters(num_rays=3, max_refl_depth=2)
        o, e = run_both(
            scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0], monostatic_rx(radius=20.0)
        )
        assert (o.received >= 0).sum() > 0
        assert_match(o, e)


class TestSphereTarget:
    def test_moving_sphere_fan(self):
        mesh, _ = sphere_mesh(2, 10.0)
        scene = compile_scene(
            [mesh.translated([800.0, 0.0, 0.0])], [1.0], [1.0], [np.array([-150.0, 30.0, 5.0])]
        )
        params = Parameters(num_rays=3, max_refl_depth=2)
        o, e = run_both(
            scene, params, [0, 0, 0], [0.0, 0.0], [0.03, 0.03, 0.0], monostatic_rx(radius=15.0)
        )
        assert (o.received >= 0).sum() > 0
        assert_match(o, e)

    def test_offset_boresight(self):
        mesh, _ = sphere_mesh(2, 10.0)
        pos = 600.0 * np.array([np.cos(0.5) * np.cos(0.2), np.sin(0.5) * np.cos(0.2), np.sin(0.2)])
        scene = compile_scene([mesh.translated(pos)], [0.8], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=3, max_refl_depth=1)
        rx = rx_sphere_geometry(
            rx_pos=np.zeros((1, 3)),
            rx_azimuth=np.array([0.5]),
            rx_elevation=np.array([0.2]),
            sphere_radius=np.array([10.0]),
            theta_span=np.array([1.0]),
            phi_span=np.array([1.0]),
        )
        o, e = run_both(scene, params, [0, 0, 0], [0.5, 0.2], [0.05, 0.05, 0.0], rx)
        assert (o.received >= 0).sum() > 0
        assert_match(o, e)


class TestMultiBounceCorner:
    def test_tilted_plate_earth_termination(self):
        mesh = rect_mesh(2.0, 300.0, 300.0, yaw=-np.pi / 4).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=3, max_refl_depth=2)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.02, 0.02, 0.0], monostatic_rx())
        # bent rays terminate on the Earth shell in both implementations
        assert (o.ray_length > 6e6).sum() > 0
        assert_match(o, e)

    def test_two_plates_double_bounce(self):
        m1 = rect_mesh(2.0, 120.0, 120.0, yaw=-np.pi / 4).translated([500.0, 0.0, 0.0])
        m2 = rect_mesh(2.0, 120.0, 120.0, yaw=np.pi / 4).translated([500.0, 300.0, 0.0])
        scene = compile_scene([m1, m2], [1.0, 0.7], [1.0, 1.0], [np.zeros(3), np.zeros(3)])
        params = Parameters(num_rays=3, max_refl_depth=3)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.02, 0.02, 0.0], monostatic_rx())
        # double-bounce paths recorded on both targets
        got = o.received >= 0
        assert_match(o, e)


class TestDirect:
    def test_direct_transmission(self):
        rx = rx_sphere_geometry(
            rx_pos=np.array([[900.0, 0.0, 0.0]]),
            rx_azimuth=np.array([np.pi]),
            rx_elevation=np.array([0.0]),
            sphere_radius=np.array([8.0]),
            theta_span=np.array([1.0]),
            phi_span=np.array([1.0]),
        )
        mesh = rect_mesh(2.0, 50.0, 50.0).translated([1000.0, 3000.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=3, max_refl_depth=1)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0], rx)
        assert (o.received >= 0).sum() > 0
        assert_match(o, e)


class TestRefraction:
    def test_dielectric_slab_multistatic(self):
        mesh = rect_mesh(10.0, 300.0, 300.0).translated([500.0, 0.0, 0.0])
        scene = compile_scene([mesh], [0.5], [1.5], [np.array([0.0, 20.0, 0.0])])
        params = Parameters(num_rays=2, max_refl_depth=2, max_refr_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=np.array([[0.0, 0.0, 0.0], [2000.0, 0.0, 0.0]]),
            rx_azimuth=np.array([0.0, np.pi]),
            rx_elevation=np.array([0.0, 0.0]),
            sphere_radius=np.array([8.0, 8.0]),
            theta_span=np.array([1.0, 1.0]),
            phi_span=np.array([1.0, 1.0]),
        )
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.01, 0.01, 0.0], rx)
        assert (o.refr_depth == 2).sum() > 0  # exiting chains exist
        assert_match(o, e)

    def test_single_ray_slab(self):
        mesh = rect_mesh(10.0, 300.0, 300.0).translated([500.0, 0.0, 0.0])
        scene = compile_scene([mesh], [0.5], [1.5], [np.zeros(3)])
        params = Parameters(num_rays=1, max_refl_depth=2, max_refr_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=np.array([[0.0, 0.0, 0.0], [2000.0, 0.0, 0.0]]),
            rx_azimuth=np.array([0.0, np.pi]),
            rx_elevation=np.array([0.0, 0.0]),
            sphere_radius=np.array([8.0, 8.0]),
            theta_span=np.array([1.0, 1.0]),
            phi_span=np.array([1.0, 1.0]),
        )
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.01, 0.01, 0.0], rx)
        assert o.received[0] >= 0 and o.received[2] >= 0
        assert_match(o, e)


class TestStrictParity:
    """strict_parity=True path: both sides apply the reference's float32
    narrowings.  Agreement is limited by FMA-contraction ambiguity in the
    float32 ops (~1 ulp of f32 per bounce direction), so tolerances are
    the documented f32 floor, not f64."""

    def test_plate_fan_parity_mode(self):
        mesh = rect_mesh(2.0, 400.0, 400.0).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.array([-100.0, 0.0, 0.0])])
        params = Parameters(num_rays=3, max_refl_depth=2)
        o, e = run_both(
            scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0],
            monostatic_rx(radius=20.0), strict=True,
        )
        np.testing.assert_array_equal(np.asarray(e.received), o.received)
        np.testing.assert_array_equal(np.asarray(e.path).T, o.path)
        got = o.received >= 0
        np.testing.assert_allclose(
            np.asarray(e.ray_length)[got], o.ray_length[got], rtol=5e-6
        )
        np.testing.assert_allclose(np.asarray(e.power)[got], o.power[got], rtol=5e-6)


class TestDepthEdge:
    def test_depth_capped_corridor(self):
        """Lanes that HIT geometry after exhausting the bounce budget
        (hit_mask true, entry gate false) must keep their state unchanged
        except for deactivation — the edge the merge-free _process_hit
        state construction relies on (normal_shader.cu:134 entry gate).
        Two facing plates form a corridor so every lane keeps hitting
        after refl_depth caps at max_refl_depth."""
        p1 = rect_mesh(2.0, 300.0, 300.0).translated([1000.0, 0.0, 0.0])
        p2 = rect_mesh(2.0, 300.0, 300.0).translated([-500.0, 0.0, 0.0])
        scene = compile_scene(
            [p1, p2], [1.0, -1.0], [1.0, 1.0],
            [np.array([40.0, 5.0, 0.0]), np.zeros(3)],
        )
        params = Parameters(num_rays=3, max_refl_depth=2)
        o, e = run_both(
            scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0],
            monostatic_rx(radius=25.0),
        )
        assert (o.refl_depth >= 2).any()  # depth-capped hits exercised
        assert_match(o, e)

    def test_zero_reflections(self):
        mesh = rect_mesh(2.0, 200.0, 200.0).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=2, max_refl_depth=0)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0], monostatic_rx())
        assert_match(o, e)

    def test_no_receivers(self):
        mesh = rect_mesh(2.0, 200.0, 200.0).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=2, max_refl_depth=2)
        rx = rx_sphere_geometry(np.zeros((0, 3)), [], [], [], [], [])
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.05, 0.05, 0.0], rx)
        assert (o.received >= 0).sum() == 0
        assert_match(o, e)


class TestPoleWrapWindow:
    """Receiver boresight near vertical: the (theta, phi) acceptance
    window crosses the phi = +/- pi/2 pole, engaging the mirrored second
    region (ray_tracer.cu:332-388).  Engine must match the oracle exactly
    through that branch."""

    def test_vertical_boresight_capture(self):
        el = 1.45  # boresight nearly straight up
        # plate tilted to retroreflect the boresight (normal along -d)
        mesh = rect_mesh(2.0, 300.0, 300.0, pitch=np.pi - el).translated(
            [1000.0 * np.cos(el), 0.0, 1000.0 * np.sin(el)]
        )
        scene = compile_scene([mesh], [0.9], [1.0])
        params = Parameters(num_rays=3, max_refl_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=np.zeros((1, 3)),
            rx_azimuth=np.array([0.0]),
            rx_elevation=np.array([el]),
            sphere_radius=np.array([5.0]),
            theta_span=np.array([1.2]),
            phi_span=np.array([1.2]),
        )
        # window must actually wrap the pole for the test to bite
        assert rx.max_phi[0] > np.pi / 2 or rx.min_phi[0] < -np.pi / 2
        o, e = run_both(scene, params, [0, 0, 0], [0.0, el], [0.2, 0.2, 0.0], rx)
        assert (o.received >= 0).sum() > 0, "pole-wrap case captured nothing"
        assert_match(o, e)

    def test_downward_boresight_capture(self):
        el = -1.45
        mesh = rect_mesh(2.0, 300.0, 300.0, pitch=np.pi - el).translated(
            [1000.0 * np.cos(el), 0.0, 1000.0 * np.sin(el)]
        )
        scene = compile_scene([mesh], [0.9], [1.0])
        params = Parameters(num_rays=3, max_refl_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=np.zeros((1, 3)),
            rx_azimuth=np.array([0.0]),
            rx_elevation=np.array([el]),
            sphere_radius=np.array([5.0]),
            theta_span=np.array([1.2]),
            phi_span=np.array([1.2]),
        )
        assert rx.max_phi[0] > np.pi / 2 or rx.min_phi[0] < -np.pi / 2
        o, e = run_both(scene, params, [0, 0, 0], [0.0, el], [0.2, 0.2, 0.0], rx)
        assert (o.received >= 0).sum() > 0
        assert_match(o, e)


class TestNorthStarCriteria:
    """BASELINE.json north star: per-ray power and phase within 1e-6 of
    the (double-precision) reference semantics."""

    def test_power_and_phase_error_bounds(self):
        mesh, _ = sphere_mesh(3, 40.0)
        scene = compile_scene(
            [mesh.translated([900.0, 0.0, 0.0])], [0.9], [1.0], [np.array([30.0, 5.0, 0.0])]
        )
        params = Parameters(num_rays=5, max_refl_depth=2)
        o, e = run_both(scene, params, [0, 0, 0], [0.0, 0.0], [0.12, 0.12, 0.0], monostatic_rx(10.0))
        got = o.received >= 0
        assert got.sum() > 0

        carrier, cspeed = 10e9, 299792458.0
        two_pi = 2 * np.pi
        phase_o = -np.mod(o.ray_length[got] / cspeed * two_pi * carrier, two_pi)
        phase_e = -np.mod(np.asarray(e.ray_length)[got] / cspeed * two_pi * carrier, two_pi)
        dphi = np.abs(phase_o - phase_e)
        dphi = np.minimum(dphi, two_pi - dphi)  # circular distance
        assert dphi.max() < 1e-6, f"phase error {dphi.max():.2e}"

        rel_power = np.abs(np.asarray(e.power)[got] / o.power[got] - 1.0)
        assert rel_power.max() < 1e-6, f"power error {rel_power.max():.2e}"


class TestFuzzScenes:
    """Randomized multi-target scenes vs the oracle (fixed seeds)."""

    @pytest.mark.parametrize("seed", [7, 21, 99])
    def test_random_scene(self, seed):
        rng = np.random.default_rng(seed)
        meshes, refls, refrs, vels = [], [], [], []
        for _ in range(rng.integers(2, 4)):
            if rng.random() < 0.5:
                m, _ = sphere_mesh(1, rng.uniform(10, 40))
            else:
                m = rect_mesh(
                    rng.uniform(1, 5), rng.uniform(50, 150), rng.uniform(50, 150),
                    yaw=rng.uniform(-0.4, 0.4), pitch=rng.uniform(-0.4, 0.4),
                )
            pos = [rng.uniform(500, 1500), rng.uniform(-200, 200), rng.uniform(-100, 100)]
            meshes.append(m.translated(pos))
            refls.append(rng.uniform(0.3, 1.0))
            refrs.append(rng.uniform(1.0, 2.0))
            vels.append(rng.uniform(-80, 80, 3))
        scene = compile_scene(meshes, refls, refrs, vels)
        params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=rng.uniform(-50, 50, (2, 3)),
            rx_azimuth=rng.uniform(-0.3, 0.3, 2),
            rx_elevation=rng.uniform(-0.3, 0.3, 2),
            sphere_radius=np.array([20.0, 30.0]),
            theta_span=np.array([1.2, 1.5]),
            phi_span=np.array([1.2, 1.5]),
        )
        o, e = run_both(
            scene, params, rng.uniform(-10, 10, 3),
            [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2)], [0.25, 0.25, 0.0], rx,
        )
        assert_match(o, e)
