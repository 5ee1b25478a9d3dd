"""Winner-cluster window shading gather (engine/shade_gather.py).

The window path must be value-identical to the plain row gather it
replaces — it is a pure data-movement restructure (block gather +
one-hot extraction are exact), with an unconditional fallback when a
tile has more distinct winner clusters than the window holds.
"""

import jax.numpy as jnp
import numpy as np

from rts_tpu.engine.shade_gather import gather_shade, shade_rows_window
from rts_tpu.sim.cpi import prepare_cpi, trace_cpi
from rts_tpu.config import Parameters

from test_driver import make_world


def _mk_table(t_rows, f=10, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((t_rows, f)), jnp.float32)


class TestWindowGatherUnit:
    def test_matches_row_gather(self):
        """Lanes drawn from few clusters per tile: exact row equality."""
        rng = np.random.default_rng(1)
        cs, rt, t_rows, l = 32, 64, 1000, 200  # non-multiple tail lane block
        table = _mk_table(t_rows)
        tiles = -(-l // rt)
        tri = np.empty((l,), np.int64)
        n_cl = -(-t_rows // cs)
        for t in range(tiles):
            cls = rng.choice(n_cl, size=5, replace=False)
            rows = slice(t * rt, min((t + 1) * rt, l))
            c = rng.choice(cls, size=rows.stop - rows.start)
            tri[rows] = np.minimum(c * cs + rng.integers(0, cs, rows.stop - rows.start), t_rows - 1)
        out, overflow = shade_rows_window(table, jnp.asarray(tri, jnp.int32), rt, cs, window_k=8)
        assert not bool(overflow)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[tri])

    def test_out_of_range_tri_clipped(self):
        cs, rt, t_rows = 32, 64, 100
        table = _mk_table(t_rows)
        tri = jnp.asarray([-5, 0, 99, 150, 7, 3, 99, 0], jnp.int32)
        out, overflow = shade_rows_window(table, tri, rt, cs, window_k=8)
        assert not bool(overflow)
        ref = np.asarray(table)[np.clip(np.asarray(tri), 0, t_rows - 1)]
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_overflow_flag_and_fallback(self):
        """More distinct winner clusters than window_k: flag raises and
        gather_shade falls back to the exact row gather."""
        cs, rt, t_rows, l = 8, 32, 256, 64
        table = _mk_table(t_rows)
        rng = np.random.default_rng(2)
        tri = jnp.asarray(rng.integers(0, t_rows, l), jnp.int32)  # ~30 clusters/tile
        _, overflow = shade_rows_window(table, tri, rt, cs, window_k=4)
        assert bool(overflow)

        class _Cfg:
            shade_gather = "window"
            shade_window_k = 4
            accel = "cluster"
            ray_tile = rt
            cluster_size = cs

        out = gather_shade(table, tri, _Cfg())  # [F, L] lanes-last
        np.testing.assert_array_equal(np.asarray(out).T, np.asarray(table)[np.asarray(tri)])


class TestWindowGatherEndToEnd:
    def test_trace_bit_identical(self):
        """Full clustered CPI (interpret mode): shade_gather='window'
        must be BIT-identical to the default row gather."""
        w = make_world(num_pulses=2, rotating=True, target_speed=50.0)
        params = Parameters(num_rays=5, max_refl_depth=2)
        kw = dict(
            dtype=jnp.float32, accel="cluster", cluster_size=128,
            ray_tile=128, interpret=True,
        )
        b0, batch0, cfg0, spec0 = prepare_cpi(w, params, **kw)
        ref = trace_cpi(b0, batch0, cfg0, spec0)
        b1, batch1, cfg1, spec1 = prepare_cpi(w, params, shade_gather="window", **kw)
        win = trace_cpi(b1, batch1, cfg1, spec1)
        for name in ("received", "power", "doppler", "delay"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)), np.asarray(getattr(win, name)), err_msg=name
            )
