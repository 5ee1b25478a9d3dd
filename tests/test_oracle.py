"""Physics golden tests: oracle vs analytic closed forms (SURVEY.md §4.2).

Geometry used throughout: monostatic-ish setups on the x axis where leg
lengths are exact, so free-space spreading, delay, and Doppler have
closed forms.
"""

import numpy as np
import pytest

from rts_tpu.config import Parameters
from rts_tpu.core.constants import SPEED_OF_LIGHT
from rts_tpu.geometry import rect_mesh
from rts_tpu.geometry.scene import compile_scene
from rts_tpu.oracle import generate_fan, trace_pulse
from rts_tpu.physics import rx_sphere_geometry

FOUR_PI = 4 * np.pi


def monostatic_rx(radius=5.0, spans=(1.0, 1.0), pos=(0.0, 0.0, 0.0), azimuth=0.0, elevation=0.0):
    """Receiver at ``pos`` with boresight (azimuth, elevation)."""
    return rx_sphere_geometry(
        rx_pos=np.array([pos]),
        rx_azimuth=np.array([azimuth]),
        rx_elevation=np.array([elevation]),
        sphere_radius=np.array([radius]),
        theta_span=np.array([spans[0]]),
        phi_span=np.array([spans[1]]),
    )


def plate_scene(x=1000.0, size=200.0, thickness=2.0, refl=1.0, refr=1.0, vel=(0, 0, 0)):
    """Large plate (box) centred at (x, 0, 0) facing the origin."""
    mesh = rect_mesh(thickness, size, size).translated([x, 0.0, 0.0])
    return compile_scene([mesh], [refl], [refr], [np.asarray(vel, float)])


class TestSingleBounce:
    """BASELINE config 1: single static target, monostatic, one pulse."""

    def test_power_delay_one_ray(self):
        x, th = 1000.0, 2.0
        d1 = x - th / 2  # Tx -> front face
        scene = plate_scene(x=x, thickness=th)
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx(radius=5.0)
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)

        assert res.received[0] == 0
        assert res.refl_depth[0] == 1
        # Return leg ends exactly at the receiver position (origin).
        assert np.isclose(res.ray_length[0], 2 * d1, rtol=1e-12)
        expected_power = 1.0 / (FOUR_PI * d1**2) * 1.0 / (FOUR_PI**2 * d1**2)
        assert np.isclose(res.power[0], expected_power, rtol=1e-12)
        assert res.doppler[0] == 0.0
        delay = res.ray_length[0] / SPEED_OF_LIGHT
        assert np.isclose(delay, 2 * d1 / SPEED_OF_LIGHT)
        # Path matrix: one bounce on target 0.
        assert res.path[0, 0] == 0
        assert np.all(res.path[0, 1:] == -1)

    def test_refl_coeff_scales_power(self):
        scene_full = plate_scene(refl=1.0)
        scene_half = plate_scene(refl=0.5)
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()
        a = trace_pulse(scene_full, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        b = trace_pulse(scene_half, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert np.isclose(b.power[0], 0.5 * a.power[0])

    def test_miss_everything(self):
        scene = plate_scene(x=1000.0, size=10.0)
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()
        # Boresight pointed well away from the plate.
        res = trace_pulse(scene, params, [0, 0, 0], [np.pi / 2, 0.0], [0.1, 0.1, 0.0], rx)
        assert res.received[0] == -1
        assert res.power[0] == 0.0

    def test_first_hit_point(self):
        scene = plate_scene(x=500.0, thickness=4.0)
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert np.allclose(res.first_hit[0], [498.0, 0.0, 0.0], atol=1e-6)


class TestDirectTransmission:
    def test_direct_path(self):
        d = 800.0
        # Receiver boresight back toward the transmitter.
        rx = rx_sphere_geometry(
            rx_pos=np.array([[d, 0.0, 0.0]]),
            rx_azimuth=np.array([np.pi]),
            rx_elevation=np.array([0.0]),
            sphere_radius=np.array([5.0]),
            theta_span=np.array([1.0]),
            phi_span=np.array([1.0]),
        )
        scene = plate_scene(x=100000.0, size=1.0)
        # Move the decoy plate off boresight so the direct ray truly misses.
        scene.tri_verts = scene.tri_verts + np.array([0.0, 5000.0, 0.0])
        params = Parameters(num_rays=1, max_refl_depth=1)
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert res.received[0] == 0
        assert res.refl_depth[0] == 0
        # Capture point is the receiver position itself (far sphere root).
        assert np.isclose(res.ray_length[0], d, rtol=1e-12)
        assert np.isclose(res.power[0], 1.0 / (FOUR_PI**2 * d**2), rtol=1e-12)
        assert res.doppler[0] == 0.0


class TestDoppler:
    def test_head_on_closing_velocity(self):
        v = 300.0  # target closing along -x
        scene = plate_scene(vel=(-v, 0, 0))
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        # k0 = +x, k1 = -x  =>  accum = dot(V, k1-k0) = (-v)(-2) = 2v.
        assert np.isclose(res.doppler[0], 2 * v, rtol=1e-12)

    def test_transverse_velocity_no_doppler(self):
        scene = plate_scene(vel=(0, 123.0, 0))
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert np.isclose(res.doppler[0], 0.0, atol=1e-9)


class TestDepthBudgets:
    def test_zero_reflections_allowed_kills_return(self):
        scene = plate_scene()
        params = Parameters(num_rays=1, max_refl_depth=0)
        rx = monostatic_rx()
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        # Entry gate blocks the hit entirely: nothing recorded.
        assert res.received[0] == -1
        assert res.refl_depth[0] == 0
        assert res.power[0] == 0.0

    def test_mirror_bend_to_side_receiver(self):
        # 45-degree plate bends the boresight ray 90 degrees to +y; the
        # side receiver catches it.  Hit point: x = 1000 - sqrt(2) (plane
        # through the rotated -x face).
        mesh_a = rect_mesh(2.0, 300.0, 300.0, yaw=-np.pi / 4).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh_a], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=1, max_refl_depth=1)
        hit_x = 1000.0 - np.sqrt(2.0)
        rx = rx_sphere_geometry(
            rx_pos=np.array([[hit_x, 600.0, 0.0]]),
            rx_azimuth=np.array([-np.pi / 2]),
            rx_elevation=np.array([0.0]),
            sphere_radius=np.array([5.0]),
            theta_span=np.array([1.0]),
            phi_span=np.array([1.0]),
        )
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert res.received[0] == 0
        assert np.isclose(res.ray_length[0], hit_x + 600.0, rtol=1e-6)


class TestEarthTermination:
    def test_bounced_ray_that_misses_receiver_terminates(self):
        # Tilted plate bends the ray away from any receiver; from inside
        # the Earth sphere every direction exits it, so the bounced ray is
        # terminated with extra path length (ray_tracer.cu:438-477).
        mesh = rect_mesh(2.0, 300.0, 300.0, yaw=np.pi / 4).translated([1000.0, 0.0, 0.0])
        scene = compile_scene([mesh], [1.0], [1.0], [np.zeros(3)])
        params = Parameters(num_rays=1, max_refl_depth=1)
        rx = monostatic_rx()  # at origin; bent ray goes to +y, misses it
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert res.received[0] == -1
        # Ray length = first leg + distance to the Earth shell.
        assert res.ray_length[0] > 6.0e6


class TestFanGeneration:
    def test_single_ray_is_boresight(self):
        params = Parameters(num_rays=1)
        d = generate_fan(params, [0.3, -0.2], [0.1, 0.1, 0.0])
        expect = np.array(
            [
                np.cos(0.3) * np.cos(-0.2),
                np.sin(0.3) * np.cos(-0.2),
                np.sin(-0.2),
            ]
        )
        assert np.allclose(d[0], expect)

    def test_fan_is_unit_and_spans(self):
        params = Parameters(num_rays=5)
        d = generate_fan(params, [0.0, 0.0], [0.2, 0.2, 0.0])
        assert d.shape == (125, 3)
        assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
        az = np.arctan2(d[:, 1], d[:, 0])
        el = np.arcsin(np.clip(d[:, 2], -1, 1))
        assert az.max() <= 0.11 and az.min() >= -0.11
        assert el.max() <= 0.11 and el.min() >= -0.11

    def test_boresight_rotation_centres_fan(self):
        params = Parameters(num_rays=3)
        az0, el0 = 1.0, 0.4
        d = generate_fan(params, [az0, el0], [0.05, 0.05, 0.0])
        centre = d[13]  # middle of 3x3x3 grid
        centre = centre / np.linalg.norm(centre)
        expect = np.array(
            [np.cos(az0) * np.cos(el0), np.sin(az0) * np.cos(el0), np.sin(el0)]
        )
        assert np.allclose(centre, expect, atol=1e-9)


class TestRefraction:
    def _setup(self, refl=0.5, max_refl=2):
        # Dielectric slab between Tx and a far receiver; monostatic Rx at
        # the origin catches the specular return, Rx1 behind the slab
        # catches the transmitted (twice-refracted) ray.
        slab_x, th = 500.0, 10.0
        mesh = rect_mesh(th, 300.0, 300.0).translated([slab_x, 0.0, 0.0])
        scene = compile_scene([mesh], [refl], [1.5], [np.zeros(3)])
        params = Parameters(num_rays=1, max_refl_depth=max_refl, max_refr_depth=2)
        rx = rx_sphere_geometry(
            rx_pos=np.array([[0.0, 0.0, 0.0], [2000.0, 0.0, 0.0]]),
            rx_azimuth=np.array([0.0, np.pi]),
            rx_elevation=np.array([0.0, 0.0]),
            sphere_radius=np.array([5.0, 5.0]),
            theta_span=np.array([1.0, 1.0]),
            phi_span=np.array([1.0, 1.0]),
        )
        return scene, params, rx, slab_x, th

    def test_slot_layout_and_capture(self):
        scene, params, rx, slab_x, th = self._setup()
        assert params.ray_total == (params.max_refl_depth + 3) * 1
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        # Slot 0: primary specular return to Rx0.
        assert res.received[0] == 0
        # Slot 2 (exiting refraction chain): transmitted ray to Rx1.
        assert res.received[2] == 1
        assert res.refr_depth[2] == 2
        # Transmitted ray length = straight line Tx->Rx1 (normal incidence).
        assert np.isclose(res.ray_length[2], 2000.0, rtol=1e-9)

    def test_transmitted_power(self):
        scene, params, rx, slab_x, th = self._setup(refl=0.5)
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        d1 = slab_x - th / 2  # Tx -> front face
        d2 = th  # inside slab
        d3 = 2000.0 - (slab_x + th / 2)  # back face -> Rx1
        expect = (
            1.0 / (FOUR_PI * d1**2)
            * 0.5  # (1-|refl|) at entry
            * 1.0 / (FOUR_PI * d2**2)
            * 0.5  # (1-|refl|) at exit
            * 1.0 / (FOUR_PI**2 * d3**2)
        )
        assert np.isclose(res.power[2], expect, rtol=1e-9)

    def test_trapped_chain_path_prefill(self):
        scene, params, rx, *_ = self._setup()
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        # Trapped chain (slot 1) carries the full pre-filled path row.
        assert np.all(res.path[1] == 0)

    def test_mirror_target_never_refracts(self):
        scene, params, rx, *_ = self._setup(refl=1.0)
        res = trace_pulse(scene, params, [0, 0, 0], [0.0, 0.0], [0.1, 0.1, 0.0], rx)
        assert res.received[2] == -1  # no transmitted ray
        assert res.received[0] == 0  # specular return intact
