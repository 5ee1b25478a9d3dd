"""Double-single arithmetic: ~49-bit effective precision on f32 ops.

Note: this suite runs with x64 enabled (conftest) so NumPy reference
values are true float64; the ds ops themselves only ever use float32.
"""

import numpy as np
import pytest

from rts_tpu.core import ds as dsm


def _err(got_ds, want_f64):
    return np.abs(dsm.to_f64(got_ds) - want_f64)


RNG = np.random.default_rng(3)


def test_from_to_roundtrip():
    x = RNG.uniform(-1e6, 1e6, 256)
    np.testing.assert_allclose(dsm.to_f64(dsm.from_f64(x)), x, rtol=2e-14)


def test_add_exactness():
    a = RNG.uniform(-1e6, 1e6, 512)
    b = RNG.uniform(-1e-3, 1e-3, 512)
    got = dsm.add(dsm.from_f64(a), dsm.from_f64(b))
    assert _err(got, a + b).max() < np.abs(a + b).max() * 1e-13


def test_accumulation_beats_f32():
    """Summing many small increments: ds keeps ~1e-13 relative error where
    plain f32 drifts to ~1e-6 (the ray-length accumulation use case)."""
    legs = RNG.uniform(500.0, 2000.0, 64).astype(np.float32)
    acc = dsm.ds(np.float32(0.0))
    f32 = np.float32(0.0)
    for leg in legs:
        acc = dsm.add_f32(acc, leg)
        f32 += leg
    exact = np.sum(legs.astype(np.float64))
    assert _err(acc, exact) < 1e-8
    # (f32 may happen to be close for 64 terms; ds must be far better)
    assert _err(acc, exact) <= abs(np.float64(f32) - exact) + 1e-8


def test_mul_div():
    a = RNG.uniform(0.1, 1e4, 256)
    b = RNG.uniform(0.1, 1e4, 256)
    np.testing.assert_allclose(dsm.to_f64(dsm.mul(dsm.from_f64(a), dsm.from_f64(b))), a * b, rtol=1e-13)
    np.testing.assert_allclose(dsm.to_f64(dsm.div(dsm.from_f64(a), dsm.from_f64(b))), a / b, rtol=1e-12)


def test_dot3():
    v = RNG.uniform(-1e3, 1e3, (6, 128))
    got = dsm.dot3(*[dsm.from_f64(v[i]) for i in range(3)], *[dsm.from_f64(v[i]) for i in range(3, 6)])
    want = v[0] * v[3] + v[1] * v[4] + v[2] * v[5]
    np.testing.assert_allclose(dsm.to_f64(got), want, rtol=1e-12)


def test_mod_two_pi_phase_accuracy():
    """The killer case: delay * 2*pi*fc ~ 4e5 radians; ds phase must hold
    ~1e-7 rad where f32 mod quantises at ~0.03 rad."""
    c, fc = 299792458.0, 10e9
    lengths = RNG.uniform(1000.0, 20000.0, 512)
    arg = lengths / c * 2 * np.pi * fc  # up to ~4e6 rad
    k = dsm.from_f64(2 * np.pi * fc / c)
    got = dsm.mod_two_pi(dsm.mul(dsm.from_f64(lengths), k))
    want = np.mod(arg, 2 * np.pi)
    err = np.abs(dsm.to_f64(got) - want)
    err = np.minimum(err, 2 * np.pi - err)
    assert err.max() < 1e-5, err.max()

    f32_err = np.abs(np.mod(arg.astype(np.float32), np.float32(2 * np.pi)).astype(np.float64) - want)
    f32_err = np.minimum(f32_err, 2 * np.pi - f32_err)
    assert err.max() < f32_err.max() / 100  # orders of magnitude better


def test_mod_two_pi_range():
    vals = dsm.mod_two_pi(dsm.from_f64(np.array([0.0, 6.28318, 1e5, -3.0, 12.56637])))
    out = dsm.to_f64(vals)
    assert (out >= 0.0).all() and (out < 2 * np.pi + 1e-6).all()


def test_sqrt():
    v = RNG.uniform(1e-12, 1e12, 512)
    got = dsm.to_f64(dsm.sqrt(dsm.from_f64(v)))
    np.testing.assert_allclose(got, np.sqrt(v), rtol=1e-13)
    # non-positive inputs return 0 (clamped discriminants)
    z = dsm.to_f64(dsm.sqrt(dsm.from_f64(np.array([0.0, -1.0]))))
    np.testing.assert_array_equal(z, [0.0, 0.0])


def test_v3_ops_vs_f64():
    a = RNG.uniform(-1e3, 1e3, (3, 256))
    b = RNG.uniform(-1e3, 1e3, (3, 256))
    av = dsm.DS3(*(dsm.from_f64(a[i]) for i in range(3)))
    bv = dsm.DS3(*(dsm.from_f64(b[i]) for i in range(3)))
    np.testing.assert_allclose(
        dsm.to_f64(dsm.v3_dot(av, bv)), (a * b).sum(axis=0), rtol=1e-11
    )
    cr = dsm.v3_cross(av, bv)
    want = np.cross(a.T, b.T).T
    # cancellation in x*y - y*x inflates RELATIVE error when the result is
    # small; the ds absolute error stays ~2^-48 of the term magnitudes
    for i, c in enumerate(cr):
        np.testing.assert_allclose(dsm.to_f64(c), want[i], rtol=1e-10, atol=1e-5)


def test_v3_normalize_unit():
    a = RNG.uniform(-5, 5, (3, 256))
    av = dsm.DS3(*(dsm.from_f64(a[i]) for i in range(3)))
    n = dsm.v3_normalize(av)
    mag = sum(dsm.to_f64(c) ** 2 for c in n)
    np.testing.assert_allclose(mag, 1.0, rtol=1e-13)
    want = a / np.linalg.norm(a, axis=0, keepdims=True)
    for i, c in enumerate(n):
        np.testing.assert_allclose(dsm.to_f64(c), want[i], rtol=1e-12, atol=1e-13)
