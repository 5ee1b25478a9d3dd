"""Microbench: shade_pack row-gather formulations on the real chip.

The in-situ r4 profile (profile_insitu, fixed readback) puts the hit
shading gather at ~3.0 ms/pulse — the largest single hit-body item.
Hypothesis: the [L, 10] gather OUTPUT pads its minor dim to the 128-lane
tile (the r3q lane-padding trap: 250k x 128 lanes = 128 MB of padded
traffic for 10 MB logical), then pays a relayout transpose to the
engine's [10, L] lanes-last form.

Variants (all produce [10, L] bit-identical values):
  rows   table[tri].T              (current _shade_rows)
  lanes  tableT[:, tri]            (gather along the LANE axis of the
                                    pre-transposed [10, T] table — no
                                    padded intermediate)
  comp   stack of 10 1-D gathers   (tableT[f][tri] per component — no
                                    2-D operands at all)
  win    resident-live remap then row-gather from the compact live table
         (addresses unchanged, table 40 MB -> ~300 KB: measures whether
         the cost is address generation or table locality)

Timing: lax.map over P pulse-clones (defeats CSE), device-side scalar
readback, best of N.  Run ALONE (1-CPU box + tunnel serialisation).
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--lanes", type=int, default=250047)
ap.add_argument("--tris", type=int, default=1000000)
ap.add_argument("--pulses", type=int, default=16)
ap.add_argument("--repeat", type=int, default=5)
ap.add_argument("--live", type=int, default=64, help="distinct live clusters of 128 tris")
args = ap.parse_args()

L, T, P = args.lanes, args.tris, args.pulses
rng = np.random.default_rng(0)
table_np = rng.standard_normal((T, 10), np.float32)
# winner tris clustered like the real workload: lanes pick tris from
# `live` Morton clusters of 128, tile-correlated
live = np.sort(rng.choice(T // 128, size=args.live, replace=False))
cl = live[rng.integers(0, args.live, size=L)]
tri_np = (cl * 128 + rng.integers(0, 128, size=L)).astype(np.int32)

table = jnp.asarray(table_np)
tableT = jnp.asarray(table_np.T)
tri = jnp.asarray(tri_np)

live_sorted = jnp.asarray(live.astype(np.int32))
live_cols = (live_sorted[:, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(-1)
small = tableT[:, live_cols]  # [10, live*128]


def pulse_map(f):
    @jax.jit
    def run():
        def body(i):
            t2 = tri + (0 * i).astype(jnp.int32)
            return jnp.sum(f(t2))
        return jnp.sum(jax.lax.map(body, jnp.arange(P, dtype=jnp.int32)))
    return run


VARIANTS = {
    "rows  table[tri].T": pulse_map(lambda t2: table[t2].T),
    "lanes tableT[:, tri]": pulse_map(lambda t2: tableT[:, t2]),
    "comp  10x 1-D gathers": pulse_map(
        lambda t2: jnp.stack([tableT[f][t2] for f in range(10)], axis=0)
    ),
    "win   remap + small row-gather": pulse_map(
        lambda t2: small[:, jnp.searchsorted(live_sorted, t2 // 128).astype(jnp.int32) * 128 + t2 % 128]
    ),
}

for name, fn in VARIANTS.items():
    float(fn())  # compile
    float(fn())  # warm
    best = np.inf
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best / P * 1000:7.3f} ms/pulse", flush=True)

# value identity (on host, small slice)
a = np.asarray(table[tri[:1024]].T)
b = np.asarray(tableT[:, tri[:1024]])
np.testing.assert_array_equal(a, b)
print("GATHER MICRO DONE")
