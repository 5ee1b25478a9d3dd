"""Multi-chip sharding: sharded CPI must be bit-identical to single-chip
(SURVEY.md §4 item 4).  Runs on 8 virtual CPU devices (conftest)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rts_tpu import Parameters
from rts_tpu.engine.cpi import trace_cpi
from rts_tpu.parallel import make_mesh, shard_batch, trace_cpi_sharded
from rts_tpu.sim import prepare_cpi

from test_driver import make_world


def _assert_identical(a, b):
    for name, x, y in (
        ("power", a.power, b.power),
        ("doppler", a.doppler, b.doppler),
        ("delay", a.delay, b.delay),
        ("received", a.received, b.received),
        ("agg.power", a.agg.power, b.agg.power),
        ("agg.delay", a.agg.delay, b.agg.delay),
        ("agg.phase", a.agg.phase, b.agg.phase),
        ("agg.doppler", a.agg.doppler, b.agg.doppler),
        ("agg.npath", a.agg.npath, b.agg.npath),
        ("agg.path_match", a.agg.path_match, b.agg.path_match),
        ("agg.emit", a.agg.emit, b.agg.emit),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


@pytest.mark.parametrize("pulse_shards,ray_shards", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_equals_single(pulse_shards, ray_shards):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    w = make_world(num_pulses=8, rotating=True, target_speed=50.0)
    params = Parameters(num_rays=2, max_refl_depth=2)
    base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float64)

    single = trace_cpi(base, batch, cfg, spec)

    mesh = make_mesh(pulse_shards, ray_shards)
    sharded = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
    _assert_identical(single, sharded)


def test_sharded_refraction_multistatic():
    from rts_tpu.sim import Path, Receiver

    w = make_world(num_pulses=4)
    w.targets[0].refl_coeff = 0.6
    w.targets[0].refr_index = 1.5
    w.add(Receiver(name="rx1", path=Path.fixed(0, 200, 0), sphere=(5.0, 1.5, 1.5)))
    params = Parameters(num_rays=2, max_refl_depth=2, max_refr_depth=2)
    base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float64)

    single = trace_cpi(base, batch, cfg, spec)
    mesh = make_mesh(2, 4)
    sharded = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
    _assert_identical(single, sharded)


def test_sharded_clustered_kernel():
    """Pallas clustered traversal (interpret) under shard_map."""
    w = make_world(num_pulses=4)
    params = Parameters(num_rays=2, max_refl_depth=2)
    base, batch, cfg, spec = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=128, ray_tile=128, interpret=True
    )
    single = trace_cpi(base, batch, cfg, spec)
    mesh = make_mesh(2, 2)
    sharded = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
    _assert_identical(single, sharded)


def test_sharded_compact_narrow():
    """compact_narrow under shard_map: each device's lane block decides
    its own narrow/full branch from its local live tiles, but both
    branches are bit-identical to full width, so sharded must equal
    single-chip.  num_rays=8 + ray_tile=64 gives each ray shard 4 full
    tiles (narrow budget 2), and the small far plate kills most lanes
    after segment 1 so the narrow branch actually fires."""
    w = make_world(num_pulses=2)
    params = Parameters(num_rays=8, max_refl_depth=2)
    base, batch, cfg, spec = prepare_cpi(
        w, params, dtype=jnp.float32, accel="cluster", cluster_size=64,
        ray_tile=64, interpret=True, compact_narrow=2,
    )
    single = trace_cpi(base, batch, cfg, spec)
    mesh = make_mesh(2, 2)
    sharded = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
    _assert_identical(single, sharded)


def test_sharded_mid_shape_caps_fire():
    """Mid-shape sharded bit-identity with the CAP paths actually firing
    (r4 verdict item 5): a 15³ fan with refine/ds-replay, replay_cap,
    agg_cap and compact_narrow all active under a pulse x ray mesh.

    Caps are derived from the measured received counts so both regimes
    are provably exercised: cap_small < max received (replay keeps-f32
    overflow + aggregation's exact full-width lax.cond fallback) and
    cap_big >= max received (the compacted gather/scatter paths).  Both
    must be bit-identical to the single-device trace with the same cfg.
    Reference boundary: aggregation.cu:102-185."""
    import warnings

    w = make_world(num_pulses=1, rotating=True, target_speed=50.0)
    params = Parameters(num_rays=15, max_refl_depth=2)
    knobs = dict(
        dtype=jnp.float32, accel="cluster", cluster_size=128, ray_tile=128,
        sub_tiles=2, candidates=16, mt_group=4, interpret=True,
        compact_narrow=2, refine=True,
    )
    base0, batch0, cfg0, spec0 = prepare_cpi(w, params, **knobs)
    probe = trace_cpi(base0, batch0, cfg0, spec0)
    counts = np.asarray((np.asarray(probe.received) >= 0).sum(axis=1))
    cnt_max = int(counts.max())
    assert cnt_max > 1, "scene must produce received lanes for caps to matter"

    # ray sharding is the axis that stresses the cap paths (regather +
    # compaction); pulse sharding is covered by the other tests here
    mesh = make_mesh(1, 3)  # 15^3 = 3375 lanes -> 1125 per ray shard
    for cap in (max(1, cnt_max // 2), cnt_max + 4):
        base, batch, cfg, spec = prepare_cpi(
            w, params, **knobs, replay_cap=cap, agg_cap=cap,
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # replay-overflow UserWarning
            single = trace_cpi(base, batch, cfg, spec)
            sharded = trace_cpi_sharded(
                base, shard_batch(batch, mesh), cfg, spec, mesh
            )
        _assert_identical(single, sharded)
    # the small cap really was exceeded and the big one really held
    assert cnt_max // 2 < cnt_max and cnt_max <= cnt_max + 4


def test_bad_divisibility_raises():
    w = make_world(num_pulses=3)
    params = Parameters(num_rays=2, max_refl_depth=1)
    base, batch, cfg, spec = prepare_cpi(w, params)
    mesh = make_mesh(2, 1)
    with pytest.raises(ValueError, match="not divisible"):
        trace_cpi_sharded(base, batch, cfg, spec, mesh)
