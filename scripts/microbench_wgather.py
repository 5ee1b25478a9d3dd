"""Time the XLA candidate-pack gather that a window-DMA kernel needs.

Idea (docs/PERF.md r3k): phase 1 gathers each tile's candidate cluster
packs into one contiguous HBM buffer [16, tiles*K*cs] so the kernel can
issue ONE DMA + ONE wait per mt_group window instead of G starts +
G waits — cutting per-tile scalar DMA events ~8x.  Bandwidth is not the
question (the gather writes ~256 MB/segment, < 1 ms at HBM rates); the
question is whether XLA's gather lowering on TPU reaches bandwidth for
31k row-blocks of 8 KB.  This measures exactly that shape, plus the
row-major alternative layout.

Run alone (the axon tunnel serialises TPU processes).
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("--tris", type=int, default=1000000)
ap.add_argument("--cluster-size", type=int, default=128)
ap.add_argument("--tiles", type=int, default=489)
ap.add_argument("--k", type=int, default=64)
args = ap.parse_args()

cs = args.cluster_size
c = -(-args.tris // cs)
tiles, K = args.tiles, args.k
rng = np.random.default_rng(0)

pack = jnp.asarray(rng.standard_normal((16, c * cs)), jnp.float32)
# realistic candidate ids: near-diagonal clusters per tile
base = (np.arange(tiles, dtype=np.int64) * c) // tiles
cand = (base[:, None] + rng.integers(0, 40, (tiles, K))) % c
cand = jnp.asarray(cand, jnp.int32)

out_mb = 16 * tiles * K * cs * 4 / 1e6
print(f"# C={c} cs={cs} tiles={tiles} K={K}  gather out {out_mb:.0f} MB")


def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a)
    float(jnp.sum(out[0, :128] if out.ndim > 1 else out[:128]))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*a)
        float(jnp.sum(out[0, :128] if out.ndim > 1 else out[:128]))
        best = min(best, time.perf_counter() - t0)
    gbps = out_mb / 1000 / best
    print(f"{name}: {best * 1000:.2f} ms  ({gbps:.0f} GB/s of gather output)", flush=True)


# Layout A: field-major (what the kernel scratch wants): take along the
# cluster axis of [16, C, cs] -> [16, tiles*K, cs] -> [16, tiles*K*cs]
def gather_a(pack, cand):
    p3 = pack.reshape(16, c, cs)
    g = jnp.take(p3, cand.reshape(-1), axis=1)
    return g.reshape(16, tiles * K * cs)


# Layout B: row-major gather [C, 16*cs] by flat ids -> [tiles*K, 16*cs]
# (classic embedding-lookup shape; needs a transpose to be kernel-usable)
def gather_b(pack, cand):
    pr = pack.reshape(16, c, cs).transpose(1, 0, 2).reshape(c, 16 * cs)
    return jnp.take(pr, cand.reshape(-1), axis=0)


# Layout B2: row gather from a PRE-transposed table (transpose done once
# per scene, outside the per-segment cost)
pr_const = jnp.asarray(
    np.asarray(pack).reshape(16, c, cs).transpose(1, 0, 2).reshape(c, 16 * cs)
)


def gather_b2(pr, cand):
    return jnp.take(pr, cand.reshape(-1), axis=0)


# Layout C: one-level window coalescing — gather at mt_group granularity
# is impossible (windows mix arbitrary clusters), but a dynamic_slice
# loop approximates XLA's worst-case lowering; skip.

timed("A  field-major take(axis=1)", gather_a, pack, cand)
timed("B  row-major take(axis=0) incl. transpose", gather_b, pack, cand)
timed("B2 row-major take(axis=0), pre-transposed", gather_b2, pr_const, cand)
print("WGATHER DONE")
