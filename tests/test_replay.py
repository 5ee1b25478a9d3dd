"""The HONEST north-star test: the f32 engine (the dtype the TPU bench
ships) with double-single path replay must reproduce the f64 reference
semantics within the BASELINE.json contract — per-ray power AND phase
<= 1e-6 (reference precision: ray_tracer.h:13-28 doubles end-to-end;
aggregation.cu:59-60 double delay/phase).

The f64 engine is the proxy for the oracle here: engine-vs-oracle parity
at rtol 1e-9 in f64 is established ray-by-ray in test_engine_vs_oracle;
an oracle-direct check on the traced geometry is included for the ray
lengths themselves.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rts_tpu import Parameters
from rts_tpu.engine.cpi import trace_cpi
from rts_tpu.sim import AttitudePath, Path, Receiver, Target, prepare_cpi

from test_driver import make_world

TWO_PI = 2 * np.pi


def _phase_err(a, b):
    d = np.abs(a - b)
    return np.minimum(d, TWO_PI - d)


def _run(world, params, **kw):
    b64, batch64, cfg64, spec64 = prepare_cpi(world, params, dtype=jnp.float64)
    ref = trace_cpi(b64, batch64, cfg64, spec64)
    br, batchr, cfgr, specr = prepare_cpi(world, params, dtype=jnp.float32, refine=True, **kw)
    fine = trace_cpi(br, batchr, cfgr, specr)
    return ref, fine


def assert_north_star(ref, fine, min_received=1):
    got = np.asarray(ref.received) >= 0
    assert got.sum() >= min_received
    np.testing.assert_array_equal(np.asarray(fine.received), np.asarray(ref.received))

    ph_ref = np.asarray(ref.agg.phase, np.float64)[got]
    ph = (np.asarray(fine.agg.phase, np.float64) + np.asarray(fine.agg.phase_lo, np.float64))[got]
    dphi = _phase_err(ph_ref, ph)
    assert dphi.max() < 1e-6, f"phase error {dphi.max():.2e} rad"

    pw_ref = np.asarray(ref.power, np.float64)[got]
    pw = np.asarray(fine.power, np.float64)[got]
    rel = np.abs(pw / pw_ref - 1.0)
    assert rel.max() < 1e-6, f"power error {rel.max():.2e}"

    ag_ref = np.asarray(ref.agg.power, np.float64)[got]
    ag = np.asarray(fine.agg.power, np.float64)[got]
    rel_a = np.abs(ag / ag_ref - 1.0)
    assert rel_a.max() < 1e-6, f"agg power error {rel_a.max():.2e}"


class TestNorthStarF32:
    def test_bench_style_scene_brute(self):
        """Rotating plate + moving target, 5^3 fan, reflections — the f32
        production semantics on the dense path."""
        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        ref, fine = _run(w, params)
        assert_north_star(ref, fine, min_received=5)

    def test_bench_style_scene_clustered(self):
        """Same contract through the Pallas clustered traversal
        (interpret mode on CPU) — the exact path the TPU bench runs."""
        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        b64, batch64, cfg64, spec64 = prepare_cpi(w, params, dtype=jnp.float64)
        ref = trace_cpi(b64, batch64, cfg64, spec64)
        br, batchr, cfgr, specr = prepare_cpi(
            w, params, dtype=jnp.float32, refine=True,
            accel="cluster", cluster_size=128, ray_tile=128, interpret=True,
        )
        fine = trace_cpi(br, batchr, cfgr, specr)
        assert_north_star(ref, fine, min_received=5)

    def test_refraction_chains(self):
        """Dielectric target: trapped/exiting refraction slots must meet
        the bar too (replay refracts at the static slot steps).  A
        forward receiver behind the slab catches the exiting chains."""
        from rts_tpu.sim.paths import RotationPath

        w = make_world(num_pulses=2)
        w.targets[0].refl_coeff = 0.6
        w.targets[0].refr_index = 1.5
        w.add(
            Receiver(
                name="rx1",
                path=Path.fixed(2000, 0, 0),
                rotation=RotationPath(azimuth=np.pi),
                sphere=(8.0, 1.5, 1.5),
            )
        )
        params = Parameters(num_rays=3, max_refl_depth=2, max_refr_depth=2)
        ref, fine = _run(w, params)
        got = np.asarray(ref.received) >= 0
        n3 = params.num_rays**3
        assert got[:, n3 : 3 * n3].sum() > 0, "no refracted lanes received — weak scene"
        assert_north_star(ref, fine, min_received=3)

    def test_multi_target_multistatic(self):
        w = make_world(num_pulses=2, target_speed=80.0)
        w.add(
            Target(
                name="ball",
                path=Path.linear([(0.0, (800.0, 100.0, 0.0)), (1.0, (790.0, 104.0, 2.0))]),
                shape="sphere",
                sphere_params=(2, 30.0),
                refl_coeff=0.8,
            )
        )
        w.add(Receiver(name="rx1", path=Path.fixed(50, -50, 0), sphere=(15.0, 1.4, 1.4)))
        params = Parameters(num_rays=5, max_refl_depth=2)
        ref, fine = _run(w, params)
        assert_north_star(ref, fine, min_received=5)

    def test_plain_f32_fails_the_bar(self):
        """Sanity that the test has teeth: WITHOUT the replay the f32
        engine's phase error is orders of magnitude above 1e-6.  Pulse
        times > 0 so the rotating/moving geometry breaks the t=0 symmetry
        that can leave f32 ray lengths accidentally near-exact."""
        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        b64, batch64, cfg64, spec64 = prepare_cpi(w, params, dtype=jnp.float64)
        ref = trace_cpi(b64, batch64, cfg64, spec64)
        b32, batch32, cfg32, spec32 = prepare_cpi(w, params, dtype=jnp.float32)
        plain = trace_cpi(b32, batch32, cfg32, spec32)
        got = np.asarray(ref.received) >= 0
        ph_ref = np.asarray(ref.agg.phase, np.float64)[got]
        ph = (np.asarray(plain.agg.phase, np.float64) + np.asarray(plain.agg.phase_lo, np.float64))[got]
        assert _phase_err(ph_ref, ph).max() > 1e-4
        # POWER teeth as well: unrefined f32 per-ray and aggregated power
        # must violate the 1e-6 relative bar (measured ~9e-6 here), so a
        # regression that silently disables the replay's power path while
        # keeping phase cannot hide behind a benign scene.
        pw_ref = np.asarray(ref.power, np.float64)[got]
        pw = np.asarray(plain.power, np.float64)[got]
        assert np.abs(pw / pw_ref - 1.0).max() > 1e-6
        ag_ref = np.asarray(ref.agg.power, np.float64)[got]
        ag = np.asarray(plain.agg.power, np.float64)[got]
        assert np.abs(ag / ag_ref - 1.0).max() > 1e-6


class TestReplayInternals:
    def test_ray_length_ds_vs_f64(self):
        """Refined ray_length (hi+lo) matches the f64 engine to <= 1e-8 m
        over ~2 km paths (ds floor), where plain f32 is ~1e-4 m."""
        w = make_world(num_pulses=1, rotating=True)
        params = Parameters(num_rays=5, max_refl_depth=2)
        b64, batch64, cfg64, spec64 = prepare_cpi(w, params, dtype=jnp.float64)
        br, batchr, cfgr, specr = prepare_cpi(w, params, dtype=jnp.float32, refine=True)
        import jax

        from rts_tpu.engine.cpi import make_pulse_fn

        def trace_res(base, batch, cfg, spec):
            one_pulse, _ = make_pulse_fn(base, cfg, **spec.kwargs())
            args = jax.tree.map(
                lambda a: a[0],
                (batch.rot, batch.pos, batch.vel, batch.rx_geom, batch.rx_pos,
                 batch.tx_origin, batch.tx_dir, batch.times, batch.refine),
            )
            return one_pulse(*args)[0]

        r64 = trace_res(b64, batch64, cfg64, spec64)
        rds = trace_res(br, batchr, cfgr, specr)
        got = np.asarray(r64.received) >= 0
        assert got.sum() > 0
        rl64 = np.asarray(r64.ray_length, np.float64)[got]
        rlds = (np.asarray(rds.ray_length, np.float64) + np.asarray(rds.ray_length_lo, np.float64))[got]
        assert np.abs(rlds - rl64).max() < 1e-7  # metres, over ~2 km

    def test_replay_cap_compaction_identical(self):
        """Compacted replay (replay_cap >= received count) must produce
        exactly the full replay's refined values."""
        import dataclasses

        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float32, refine=True)
        full = trace_cpi(base, batch, cfg, spec)
        capped = trace_cpi(base, batch, dataclasses.replace(cfg, replay_cap=64), spec)
        assert int((np.asarray(full.received) >= 0).sum()) <= 64 * 2  # cap holds per pulse
        for name in ("power", "doppler", "delay", "received"):
            np.testing.assert_array_equal(
                np.asarray(getattr(full, name)), np.asarray(getattr(capped, name)), err_msg=name
            )
        # ds results are shape-compiled: the approximate term of ds.mul may
        # FMA-fuse differently between the [cap] and [lanes] graphs, so the
        # lo parts carry ~1e-9-rad compilation noise — assert the combined
        # phase to well under the 1e-6 contract instead of bitwise.
        ph_f = np.asarray(full.agg.phase, np.float64) + np.asarray(full.agg.phase_lo, np.float64)
        ph_c = np.asarray(capped.agg.phase, np.float64) + np.asarray(capped.agg.phase_lo, np.float64)
        got = np.asarray(full.received) >= 0
        np.testing.assert_allclose(ph_c[got], ph_f[got], rtol=0, atol=1e-7)

    def test_replay_cap_overflow_warns(self):
        """A cap smaller than the received-lane count must be surfaced
        loudly (check_replay_overflow / run_cpi) — a silent precision
        downgrade would break the 1e-6 contract unnoticed."""
        import dataclasses

        from rts_tpu.sim import check_replay_overflow

        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        base, batch, cfg, spec = prepare_cpi(
            w, params, dtype=jnp.float32, refine=True, replay_cap=4
        )
        out = trace_cpi(base, batch, cfg, spec)
        counts = np.asarray((np.asarray(out.received) >= 0).sum(axis=1))
        assert counts.max() > 4, "scene too weak for the overflow test"
        with pytest.warns(UserWarning, match="replay cap overflow"):
            check_replay_overflow(out, cfg)
        # a big-enough cap (or cap=0 = replay-all) must stay silent
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            check_replay_overflow(out, dataclasses.replace(cfg, replay_cap=0))
            check_replay_overflow(out, dataclasses.replace(cfg, replay_cap=int(counts.max())))

    def test_sharded_refine_bit_identical(self):
        """Replay under shard_map: per-lane ds math is elementwise, so the
        sharded result stays bit-identical to single-device."""
        import jax

        from rts_tpu.parallel import make_mesh, shard_batch, trace_cpi_sharded

        w = make_world(num_pulses=4, target_speed=50.0)
        params = Parameters(num_rays=2, max_refl_depth=2)
        base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float32, refine=True)
        single = trace_cpi(base, batch, cfg, spec)
        mesh = make_mesh(2, 4)
        sharded = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
        for name in ("power", "doppler", "received"):
            np.testing.assert_array_equal(
                np.asarray(getattr(single, name)), np.asarray(getattr(sharded, name)), err_msg=name
            )
        np.testing.assert_array_equal(np.asarray(single.agg.phase), np.asarray(sharded.agg.phase))
        np.testing.assert_array_equal(np.asarray(single.agg.phase_lo), np.asarray(sharded.agg.phase_lo))
