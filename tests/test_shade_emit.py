"""Kernel-epilogue shade emit (TraceConfig.shade_emit) vs the XLA gather.

The clustered kernel can extract the winner's 10 shade fields (base
corner normals + target-as-float — the shade_pack row the hit body
otherwise row-gathers, /root/reference/normal_shader.cu:139-194 reads the
same attributes through OptiX SBT records) in its one-hot argmin
epilogue.  The emitted values must be EXACT copies of shade_pack[tri]
for found lanes, and the full engine result must be bit-identical to the
gather path (docs/PERF.md r5 A/B).
"""

import math

import jax.numpy as jnp
import numpy as np

from rts_tpu import Parameters
from rts_tpu.accel import cluster_aabbs
from rts_tpu.engine.types import scene_to_device
from rts_tpu.ops import closest_hit_clustered, pack_tri_fields

from test_cluster_trace import CS, RT, _random_rays, make_scene


def _packs(dev):
    pack16 = pack_tri_fields(
        dev.tri_n, dev.tri_c1, dev.tri_c0, dev.tri_e1, dev.tri_e0, dev.tri_np0
    )
    sp = jnp.concatenate(
        [
            dev.tri_corner_normals.reshape(-1, 9),
            dev.tri_target.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [T, 10] — the shade_pack layout (animate.SceneBase)
    pack32 = jnp.concatenate(
        [pack16, sp.T, jnp.zeros((6, pack16.shape[1]), pack16.dtype)], axis=0
    )
    return pack16, pack32, sp


def test_emit_shade_kernel_matches_gather():
    scene = make_scene()
    dev = scene_to_device(scene, dtype=jnp.float32)
    mn, mx = cluster_aabbs(dev.tri_p0, dev.tri_e0, dev.tri_e1, CS, xp=jnp)
    pack16, pack32, sp = _packs(dev)
    o, d, tm = _random_rays()

    base = closest_hit_clustered(
        o, d, tm, pack16, mn, mx, cluster_size=CS, ray_tile=RT,
        candidates=64, interpret=True,
    )
    assert base.shade is None
    sp_np = np.asarray(sp)

    # candidate windows, forced overflow->sweep (K=1) and sweep-only
    # (K=0) must all emit the winner's exact shade row
    for k, g, st in ((64, 8, 4), (1, 2, 4), (0, 2, 4)):
        out = closest_hit_clustered(
            o, d, tm, pack32, mn, mx, cluster_size=CS, ray_tile=RT,
            candidates=k, mt_group=g, sub_tiles=st, emit_shade=True,
            interpret=True,
        )
        for f in ("found", "t", "tri", "beta", "gamma"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out, f)), np.asarray(getattr(base, f)),
                err_msg=f"{f} K={k} G={g}",
            )
        shade = np.asarray(out.shade)
        assert shade.shape == (10, o.shape[0])
        fnd = np.asarray(base.found)
        tri = np.asarray(base.tri)[fnd]
        np.testing.assert_array_equal(shade[:, fnd], sp_np[tri].T, err_msg=f"K={k} G={g}")
        # no-hit lanes carry the scratch init (zeros), never observed
        assert (shade[:, ~fnd] == 0.0).all()


def test_emit_shade_cpi_bit_identical():
    """Full engine (refraction + moving targets + narrow compaction):
    shade_emit=True must be bit-identical to the gather path."""
    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import (
        AttitudePath, Path, RadarSignal, Receiver, Target, Transmitter,
        World, prepare_cpi,
    )

    w = World()
    w.add(
        Transmitter(
            path=Path.fixed(0, 0, 0), wave=RadarSignal(carrier=10e9),
            pulse_count=2, prf=1000.0, tx_span=(0.3, 0.3, 0.0),
        )
    )
    w.add(Receiver(path=Path.fixed(0, 0, 0), sphere=(25.0, 1.2, 1.2)))
    w.add(
        Target(
            shape="sphere", sphere_params=(2, 60.0),
            path=Path.linear([(0.0, (900.0, 0.0, 0.0)), (1.0, (950.0, 0.0, 0.0))]),
            attitude=AttitudePath(yaw=0.3, yaw_rate=0.2), refl_coeff=0.9,
        )
    )
    w.add(
        Target(
            shape="rect", rect=(2.0, 80.0, 80.0),
            attitude=AttitudePath(pitch=math.pi / 2),
            path=Path.fixed(0.0, 0.0, -300.0), refl_coeff=0.5, refr_index=1.5,
        )
    )

    params = Parameters(num_rays=9, max_refl_depth=2, max_refr_depth=2)
    common = dict(
        dtype=jnp.float32, accel="cluster", cluster_size=128, ray_tile=128,
        sub_tiles=2, candidates=16, mt_group=4, interpret=True,
        compact_narrow=4,
    )
    outs = []
    for emit in (False, True):
        b, batch, cfg, spec = prepare_cpi(w, params, **common, shade_emit=emit)
        outs.append(trace_cpi(b, batch, cfg, spec))
    o0, o1 = outs
    for name in o0._fields:
        a, b = getattr(o0, name), getattr(o1, name)
        pairs = (
            [(f"{name}.{n2}", getattr(a, n2), getattr(b, n2)) for n2 in a._fields]
            if hasattr(a, "_fields")
            else [(name, a, b)]
        )
        for label, x, y in pairs:
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=label
            )
    assert int((np.asarray(o0.received) >= 0).sum()) > 0
