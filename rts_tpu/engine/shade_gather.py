"""Winner-cluster window gather for hit shading.

The fused hit-shading gather (``scene.shade_pack[tri]``,
engine/wavefront.py) is a random row gather: L ~ 250k lanes each pull a
40 B row from a ~40 MB table — scalar-ish address generation that XLA
cannot vectorise on TPU.  But the winning triangles of one 512-ray
traversal tile lie in only ~10 Morton clusters (the same locality the
two-phase kernel exploits, ops/cluster_trace.py), so the gather can be
restructured TPU-natively:

  1. per tile, build the (sorted, deduplicated) list of WINNER clusters
     from ``tri // cluster_size`` — a [tiles, rt] sort + cumsum-scatter,
     all vector work;
  2. block-gather those clusters' table rows ([tiles, KW, cs, F] — a few
     thousand contiguous block reads instead of 250k scalar ones);
  3. extract each lane's row with a one-hot [rt, KW*cs] MXU contraction
     (exact at Precision.HIGHEST: one-hot operands make every product
     0 or an exact copy).

Tiles with more than ``window_k`` distinct winner clusters cannot use
the window (a single batch-level ``lax.cond`` falls back to the plain
row gather for the whole call, so correctness is unconditional — the
bench terrain peaks at ~13 winners/tile, well under the default 16).

Because the lists are derived from the *winners* (not from phase-1
candidates), this needs no kernel plumbing and also covers tiles that
took the in-kernel hierarchical-sweep fallback.

Reference parity note: the reference's closest-hit shader reads
per-triangle attributes through OptiX's hardware-managed SBT records
(/root/reference/normal_shader.cu:139-194) — there is no gather to
optimise on a GPU with hardware pointer-chasing; this module is the
TPU-native equivalent of that attribute fetch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Chunk of ray tiles per one-hot contraction step: bounds the [CH, rt,
# KW*cs] one-hot transient to CH*512*2048*4 B = 64 MB at the production
# config while keeping the MXU batch large.
_TILE_CHUNK = 16


def shade_rows_window(table, tri, ray_tile: int, cluster_size: int, window_k: int = 16):
    """Gather ``table[clip(tri)]`` rows via per-tile winner-cluster windows.

    table: [T, F] per-triangle attribute rows (triangles Morton-clustered
        in runs of ``cluster_size`` — the accel/cluster.py order).
    tri: [L] int32 winning triangle per lane (any value; clipped).
    Returns ``(rows [L, F], overflow scalar bool)``; ``overflow`` means
    some tile had more than ``window_k`` distinct winner clusters and the
    caller must use the plain gather instead (lax.cond on it).
    """
    t_rows, f = table.shape
    l = tri.shape[0]
    cs = cluster_size
    rt = ray_tile
    kw = window_k
    n_cl = -(-t_rows // cs)

    lp = -(-l // rt) * rt
    trip = jnp.pad(jnp.clip(tri, 0, t_rows - 1), (0, lp - l))
    tiles = lp // rt
    w = (trip // cs).reshape(tiles, rt).astype(jnp.int32)

    # 1. per-tile sorted unique winner clusters -> [tiles, kw] lists
    ws = jnp.sort(w, axis=1)
    uniq = jnp.concatenate(
        [jnp.ones((tiles, 1), bool), ws[:, 1:] != ws[:, :-1]], axis=1
    )
    pos = jnp.cumsum(uniq, axis=1) - 1  # [tiles, rt] slot of each unique run
    overflow = jnp.any(pos[:, -1] + 1 > kw)
    t_idx = jnp.broadcast_to(jnp.arange(tiles, dtype=jnp.int32)[:, None], (tiles, rt))
    pos_eff = jnp.where(uniq, pos, kw)  # duplicates land out of range
    lists = jnp.full((tiles, kw), -1, jnp.int32)
    lists = lists.at[t_idx, pos_eff].set(ws, mode="drop")

    # 2. block-gather the window clusters' rows: [tiles, kw, cs, F]
    pad_rows = n_cl * cs - t_rows
    table_cl = jnp.pad(table, ((0, pad_rows), (0, 0))).reshape(n_cl, cs, f)
    rows = table_cl[jnp.clip(lists, 0, n_cl - 1)].reshape(tiles, kw * cs, f)

    # 3. one-hot MXU extraction, chunked over tiles to bound the one-hot
    # transient.  Every lane matches exactly one list slot when no tile
    # overflowed (lists hold each winner cluster once); under overflow
    # the caller discards this output.
    match = lists[:, None, :] == w[:, :, None]  # [tiles, rt, kw]
    k_slot = jnp.argmax(match, axis=-1).astype(jnp.int32)
    col = k_slot * cs + (trip % cs).reshape(tiles, rt).astype(jnp.int32)

    ch = _TILE_CHUNK
    tiles_p = -(-tiles // ch) * ch
    col_p = jnp.pad(col, ((0, tiles_p - tiles), (0, 0)))
    rows_p = jnp.pad(rows, ((0, tiles_p - tiles), (0, 0), (0, 0)))

    def chunk(args):
        col_c, rows_c = args  # [ch, rt], [ch, kw*cs, F]
        # one-hot laid out [tiles, cols, rays] so the contraction maps to
        # an MXU matmul with M=F (pads 10->16 sublanes), N=rt, K=kw*cs —
        # the [.., rays, cols] x [.., cols, F] orientation would pad the
        # tiny F onto the 128-wide N axis (~8x more hardware flops)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (ch, kw * cs, rt), 1)
            == col_c[:, None, :]
        ).astype(table.dtype)
        out_fr = jnp.einsum(
            "tcf,tcr->tfr", rows_c, oh, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.swapaxes(out_fr, 1, 2)  # [ch, rt, F]

    out = jax.lax.map(
        chunk,
        (
            col_p.reshape(-1, ch, rt),
            rows_p.reshape(-1, ch, kw * cs, f),
        ),
    )  # [tiles_p/ch, ch, rt, F]
    return out.reshape(tiles_p * rt, f)[:l], overflow


def gather_shade(table, tri, cfg):
    """Dispatch the hit-shading row gather per ``cfg.shade_gather``.

    Returns [F, L] (components-major, the engine's lanes-last layout).
    "row": plain XLA row gather (+ transpose — the gather itself fuses
    into its consumers and measured ~0 in situ, docs/PERF.md r3h).
    "window": winner-cluster window path with an unconditional
    batch-level fallback to the row gather when any tile exceeds
    ``cfg.shade_window_k`` distinct winner clusters.
    """
    tri_c = jnp.clip(tri, 0, table.shape[0] - 1)
    if cfg.shade_gather != "window" or cfg.accel != "cluster":
        return table[tri_c].T
    win, overflow = shade_rows_window(
        table, tri_c, cfg.ray_tile, cfg.cluster_size, cfg.shade_window_k
    )
    return jax.lax.cond(overflow, lambda: table[tri_c].T, lambda: win.T)
