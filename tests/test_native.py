"""C++ host runtime (rts_tpu.native) parity vs the NumPy implementations."""

import numpy as np
import pytest

from rts_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_icosphere_counts_and_invariants():
    v, t, n = native.icosphere(3, 2.5)
    assert v.shape == (642, 3) and t.shape == (1280, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 2.5, rtol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-12)
    # closed manifold: 2 tris per edge -> Euler characteristic 2
    assert v.shape[0] - (t.shape[0] * 3 // 2) + t.shape[0] == 2


def test_icosphere_rotation_matches_rotzyx():
    from rts_tpu.core.rotation import vertex_rotation

    v0, t0, n0 = native.icosphere(2, 1.0)
    v1, t1, n1 = native.icosphere(2, 1.0, yaw=0.3, pitch=-0.2, roll=0.7)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(
        v1, vertex_rotation(v0, 0.3, -0.2, 0.7, strict_parity=False), atol=1e-12
    )


def test_morton_matches_numpy():
    from rts_tpu.accel.cluster import _expand_bits  # numpy reference path

    tv = np.random.default_rng(1).uniform(-100, 100, (4096, 3, 3))
    got = native.morton_order(tv)
    # recompute the pure-NumPy ordering inline (module fn now dispatches
    # to native, so rebuild the reference here)
    c = tv.mean(axis=1)
    lo = c.min(axis=0)
    span = c.max(axis=0) - lo
    span[span == 0] = 1.0
    q = np.clip(((c - lo) / span) * 1023.0, 0, 1023).astype(np.uint64)
    code = (
        (_expand_bits(q[:, 0]) << np.uint64(2))
        | (_expand_bits(q[:, 1]) << np.uint64(1))
        | _expand_bits(q[:, 2])
    )
    ref = np.argsort(code, kind="stable")
    np.testing.assert_array_equal(got, ref)


def test_flatten_matches_fancy_indexing():
    rng = np.random.default_rng(2)
    verts = rng.normal(size=(500, 3))
    tris = rng.integers(0, 500, (900, 3)).astype(np.int32)
    np.testing.assert_allclose(native.flatten(verts, tris), verts[tris])
    perm = rng.permutation(900)
    np.testing.assert_allclose(native.flatten(verts, tris, perm), verts[tris[perm]])


def test_loader_trailing_commas(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("1 2 3, 4 5 6, 7 8 9,\n10 11 12, 13 14 15, 16 17 18,\n")
    out = native.load_triplets(str(p))
    np.testing.assert_allclose(out, np.arange(1, 19).reshape(6, 3))
