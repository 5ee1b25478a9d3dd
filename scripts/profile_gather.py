"""Microbench: random-row gathers from 1M-row tables at 30k indices —
the _process_hit attribute-fetch pattern (corner normals, target ids)."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

P, T, L = 8, 1_000_448, 29_791
key = jax.random.PRNGKey(0)
table9 = jax.random.normal(key, (T, 3, 3), jnp.float32)
table1 = jax.random.randint(key, (T,), 0, 7, jnp.int32)
idx = jax.random.randint(key, (P, L), 0, T, jnp.int32)


def timed(name, fn, *a, n=3):
    out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms total, {best/P*1000:.2f} ms/iter")


timed("floor", jax.jit(lambda x: jax.lax.map(lambda y: y.astype(jnp.float32) * 2.0, x)), idx)

timed(
    "gather [30k] from [1M,3,3] f32 x8",
    jax.jit(lambda ix, t: jax.lax.map(lambda i: jnp.sum(t[i]), ix)),
    idx, table9,
)
timed(
    "gather [30k] from [1M] i32 x8",
    jax.jit(lambda ix, t: jax.lax.map(lambda i: jnp.sum(t[i]), ix)),
    idx, table1,
)
# sorted indices (tiles hit clustered tris -> near-sorted in practice?)
idx_s = jnp.sort(idx, axis=1)
timed(
    "gather sorted [30k] from [1M,3,3] x8",
    jax.jit(lambda ix, t: jax.lax.map(lambda i: jnp.sum(t[i]), ix)),
    idx_s, table9,
)
