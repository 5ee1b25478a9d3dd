"""Sort/segment aggregation vs the O(N^2) reference-semantics oracle."""

import jax.numpy as jnp
import numpy as np

from rts_tpu.aggregate import aggregate_lanes
from rts_tpu.oracle.aggregation import aggregate as oracle_aggregate

C = 299792458.0
CARRIER = 10e9


def make_case(rng, r=48, num_rx=3, depth=3, p_direct=0.15, p_invalid=0.3):
    received = rng.integers(0, num_rx, r).astype(np.int64)
    invalid = rng.random(r) < p_invalid
    received[invalid] = -1
    refl = rng.integers(1, 3, r)
    refr = np.zeros(r, dtype=np.int64)
    direct = (~invalid) & (rng.random(r) < p_direct)
    refl[direct] = 0

    # few distinct path rows so groups form
    rows = rng.integers(-1, 3, size=(6, depth))
    path = rows[rng.integers(0, 6, r)]
    path[direct] = -1
    path[invalid] = -1

    power = rng.uniform(1e-16, 1e-12, r)
    ray_length = rng.uniform(1e3, 1e5, r)
    doppler = rng.uniform(-5e3, 5e3, r)
    return received, refl, refr, path, power, ray_length, doppler


def test_matches_oracle_random_cases():
    rng = np.random.default_rng(42)
    for case in range(5):
        received, refl, refr, path, power, ray_length, doppler = make_case(rng)
        r = received.shape[0]
        lane = aggregate_lanes(
            jnp.asarray(received, jnp.int32),
            jnp.asarray(refl, jnp.int32),
            jnp.asarray(refr, jnp.int32),
            jnp.asarray(path, jnp.int32).T,  # engine layout: [D, R]
            jnp.asarray(power),
            jnp.asarray(ray_length),
            jnp.asarray(doppler),
            num_rx=3,
            cspeed=C,
            carrier=CARRIER,
        )

        valid = received >= 0
        lanes_of = np.where(valid)[0]
        o = oracle_aggregate(
            received[valid], refl[valid], refr[valid], path[valid],
            power[valid], ray_length[valid], doppler[valid], C, CARRIER,
        )

        np.testing.assert_allclose(np.asarray(lane.npath)[lanes_of], o.npath, err_msg=f"case {case}")
        np.testing.assert_allclose(np.asarray(lane.power)[lanes_of], o.power, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(lane.delay)[lanes_of], o.delay, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(lane.phase)[lanes_of], o.phase, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(lane.doppler)[lanes_of], o.doppler, rtol=1e-12)

        # path_match translated from filtered index space to lane space
        expect_match = lanes_of[o.path_match]
        np.testing.assert_array_equal(np.asarray(lane.path_match)[lanes_of], expect_match)

        # emit = unique pathMatch representatives
        expect_emit = np.zeros(r, bool)
        expect_emit[lanes_of[o.unique_rays]] = True
        np.testing.assert_array_equal(np.asarray(lane.emit), expect_emit)


def test_identical_paths_combine_coherently():
    # Three rays, same receiver, same path: voltages average.
    received = jnp.asarray([0, 0, 0], jnp.int32)
    refl = jnp.asarray([1, 1, 1], jnp.int32)
    refr = jnp.zeros(3, jnp.int32)
    path = jnp.asarray([[2, -1], [2, -1], [2, -1]], jnp.int32)
    power = jnp.asarray([4.0, 9.0, 16.0])
    ray_length = jnp.asarray([3e3, 3e3, 3e3])
    doppler = jnp.asarray([100.0, 200.0, 300.0])
    out = aggregate_lanes(received, refl, refr, path.T, power, ray_length, doppler, 1, C, CARRIER)
    v_mean = (2.0 + 3.0 + 4.0) / 3.0
    np.testing.assert_allclose(np.asarray(out.power), v_mean**2)
    np.testing.assert_allclose(np.asarray(out.npath), 3.0)
    np.testing.assert_allclose(np.asarray(out.doppler), 200.0)
    assert np.asarray(out.emit).tolist() == [True, False, False]


def test_different_receivers_do_not_combine():
    received = jnp.asarray([0, 1], jnp.int32)
    refl = jnp.asarray([1, 1], jnp.int32)
    refr = jnp.zeros(2, jnp.int32)
    path = jnp.asarray([[0], [0]], jnp.int32)
    power = jnp.asarray([4.0, 9.0])
    out = aggregate_lanes(
        received, refl, refr, path.T, power, jnp.asarray([1e3, 1e3]),
        jnp.zeros(2), 2, C, CARRIER,
    )
    np.testing.assert_allclose(np.asarray(out.npath), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out.power), [4.0, 9.0])
    assert np.asarray(out.emit).all()


def test_direct_ray_matches_everything_at_receiver():
    # Lane 1 is direct: it aggregates over all three rays at rx 0 even
    # though their paths differ (aggregation.cu:56 quirk).
    received = jnp.asarray([0, 0, 0], jnp.int32)
    refl = jnp.asarray([1, 0, 2], jnp.int32)
    refr = jnp.zeros(3, jnp.int32)
    path = jnp.asarray([[0, -1], [-1, -1], [0, 1]], jnp.int32)
    power = jnp.asarray([1.0, 4.0, 9.0])
    out = aggregate_lanes(
        received, refl, refr, path.T, power, jnp.asarray([1e3, 2e3, 3e3]),
        jnp.zeros(3), 1, C, CARRIER,
    )
    np.testing.assert_allclose(np.asarray(out.npath), [1.0, 3.0, 1.0])
    np.testing.assert_allclose(float(out.power[1]), 4.0)  # ((1+2+3)/3)^2
    # direct lane's pathMatch is the receiver-wide minimum lane (0)
    assert int(out.path_match[1]) == 0


def test_dense_path_matches_sort_and_oracle():
    """The sort-free dense lowering (num_targets set, small radix space)
    must reproduce the sort path and the O(N^2) oracle exactly."""
    rng = np.random.default_rng(11)
    for case in range(5):
        received, refl, refr, path, power, ray_length, doppler = make_case(rng)
        args = (
            jnp.asarray(received, jnp.int32),
            jnp.asarray(refl, jnp.int32),
            jnp.asarray(refr, jnp.int32),
            jnp.asarray(path, jnp.int32).T,  # engine layout: [D, R]
            jnp.asarray(power),
            jnp.asarray(ray_length),
            jnp.asarray(doppler),
        )
        kw = dict(num_rx=3, cspeed=C, carrier=CARRIER)
        dense = aggregate_lanes(*args, **kw, num_targets=3)  # 3*4^3+1 = 193 bins
        sortp = aggregate_lanes(*args, **kw)  # num_targets=0 -> sort path
        for name in ("npath", "power", "delay", "phase", "doppler", "path_match", "emit"):
            np.testing.assert_allclose(
                np.asarray(getattr(dense, name)),
                np.asarray(getattr(sortp, name)),
                rtol=1e-12, atol=0, err_msg=f"case {case}: {name}",
            )

        valid = received >= 0
        lanes_of = np.where(valid)[0]
        o = oracle_aggregate(
            received[valid], refl[valid], refr[valid], path[valid],
            power[valid], ray_length[valid], doppler[valid], C, CARRIER,
        )
        np.testing.assert_allclose(np.asarray(dense.npath)[lanes_of], o.npath)
        np.testing.assert_allclose(np.asarray(dense.power)[lanes_of], o.power, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dense.delay)[lanes_of], o.delay, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dense.doppler)[lanes_of], o.doppler, rtol=1e-12)


def test_compact_cap_matches_full():
    """compact_cap gathers the received lanes to a cap block, aggregates
    there and scatters back (aggregate/paths.py); must match the full-lane
    path on both lowerings, and the overflow lax.cond must fall back to
    the full path.  Discrete fields are exact; float sums may differ at
    the rounding level (different reduction association)."""
    rng = np.random.default_rng(11)
    r = 4096
    received = np.where(rng.random(r) < 0.02, rng.integers(0, 2, r), -1).astype(np.int32)
    refl = rng.integers(0, 3, r).astype(np.int32)
    refr = np.zeros(r, np.int32)
    path = np.where(rng.random((r, 3)) < 0.7, rng.integers(0, 3, (r, 3)), -1).astype(np.int32)
    power = rng.random(r)
    ray_length = rng.random(r) * 1e4
    doppler = rng.standard_normal(r)
    args = (
        jnp.asarray(received, jnp.int32), jnp.asarray(refl, jnp.int32),
        jnp.asarray(refr, jnp.int32), jnp.asarray(path, jnp.int32).T,
        jnp.asarray(power), jnp.asarray(ray_length), jnp.asarray(doppler),
    )
    for nt in (3, 0):  # dense and sort lowering
        kw = dict(num_rx=2, cspeed=C, carrier=CARRIER, num_targets=nt)
        full = aggregate_lanes(*args, **kw)
        capped = aggregate_lanes(*args, **kw, compact_cap=512)
        over = aggregate_lanes(*args, **kw, compact_cap=8)  # count > cap
        for variant, lbl in ((capped, "capped"), (over, "overflow")):
            for name in ("power", "delay", "phase", "doppler"):
                np.testing.assert_allclose(
                    np.asarray(getattr(full, name)),
                    np.asarray(getattr(variant, name)),
                    rtol=1e-9, atol=1e-10, err_msg=f"nt={nt} {lbl} {name}",
                )
            for name in ("npath", "path_match", "emit"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(full, name)),
                    np.asarray(getattr(variant, name)),
                    err_msg=f"nt={nt} {lbl} {name}",
                )
