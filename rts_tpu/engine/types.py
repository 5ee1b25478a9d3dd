"""Engine-facing data containers and static configuration.

``DeviceScene`` is the HBM-resident flat scene with the per-triangle
vectors the batched intersector needs precomputed once (cross products and
dots that turn Möller–Trumbore into a handful of [R,3]x[3,T] matmuls —
see rts_tpu.engine.intersect).

``TraceConfig`` carries everything that must be static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rts_tpu.config import Parameters
from rts_tpu.geometry.scene import SceneArrays
from rts_tpu.physics.receiver_geom import RxSphereGeometry


class DeviceScene(NamedTuple):
    """Flat triangle soup + per-target attributes, as jnp arrays."""

    tri_p0: jnp.ndarray  # [T, 3]
    tri_e0: jnp.ndarray  # [T, 3]  p1 - p0
    tri_e1: jnp.ndarray  # [T, 3]  p0 - p2
    tri_n: jnp.ndarray  # [T, 3]  cross(e1, e0) — reference's geometric normal
    tri_c1: jnp.ndarray  # [T, 3]  cross(p0, e1)
    tri_c0: jnp.ndarray  # [T, 3]  cross(p0, e0)
    tri_np0: jnp.ndarray  # [T]    dot(n, p0)
    tri_corner_normals: jnp.ndarray  # [T, 3, 3]
    tri_target: jnp.ndarray  # [T] int32 (-1 padding)
    target_refl: jnp.ndarray  # [NT]
    target_refr: jnp.ndarray  # [NT]
    target_vel: jnp.ndarray  # [NT, 3]


def derive_tri_arrays(tri_verts, tri_target=None, xp=jnp):
    """Per-triangle precomputation from corner positions [T, 3, 3].

    Kept separate so per-pulse vertex animation can re-derive these inside
    jit (BVH-refit analogue of the per-pulse rebuild at ray_tracer.cpp:
    1125-1130, but as pure recompute instead of a host rebuild).
    """
    p0 = tri_verts[:, 0]
    e0 = tri_verts[:, 1] - tri_verts[:, 0]
    e1 = tri_verts[:, 0] - tri_verts[:, 2]
    n = xp.cross(e1, e0)
    c1 = xp.cross(p0, e1)
    c0 = xp.cross(p0, e0)
    np0 = xp.sum(n * p0, axis=-1)
    return p0, e0, e1, n, c1, c0, np0


def scene_to_device(scene: SceneArrays, dtype=jnp.float32) -> DeviceScene:
    tv = jnp.asarray(scene.tri_verts, dtype=dtype)
    p0, e0, e1, n, c1, c0, np0 = derive_tri_arrays(tv)
    return DeviceScene(
        tri_p0=p0,
        tri_e0=e0,
        tri_e1=e1,
        tri_n=n,
        tri_c1=c1,
        tri_c0=c0,
        tri_np0=np0,
        tri_corner_normals=jnp.asarray(scene.tri_normals, dtype=dtype),
        tri_target=jnp.asarray(scene.tri_target, dtype=jnp.int32),
        target_refl=jnp.asarray(scene.target_refl_coeff, dtype=dtype),
        target_refr=jnp.asarray(scene.target_refr_index, dtype=dtype),
        target_vel=jnp.asarray(scene.target_velocity, dtype=dtype),
    )


class RxGeomDevice(NamedTuple):
    """Receiver spheres + acceptance windows (see receiver_geom.py)."""

    centre: jnp.ndarray  # [NR, 3]
    radius: jnp.ndarray  # [NR]
    min_theta: jnp.ndarray  # [NR]
    max_theta: jnp.ndarray  # [NR]
    min_phi: jnp.ndarray  # [NR]
    max_phi: jnp.ndarray  # [NR]

    @classmethod
    def from_host(cls, rx: RxSphereGeometry, dtype=jnp.float32) -> "RxGeomDevice":
        return cls(
            centre=jnp.asarray(rx.centre, dtype=dtype),
            radius=jnp.asarray(rx.radius, dtype=dtype),
            min_theta=jnp.asarray(rx.min_theta, dtype=dtype),
            max_theta=jnp.asarray(rx.max_theta, dtype=dtype),
            min_phi=jnp.asarray(rx.min_phi, dtype=dtype),
            max_phi=jnp.asarray(rx.max_phi, dtype=dtype),
        )

    @property
    def num_rx(self) -> int:
        return int(self.centre.shape[0])


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static trace parameters (hashable — used as a jit static arg).

    ``max_refl_dev`` is the device-side "stop index" (user max_refl + 1,
    ray_tracer.cpp:776); ``max_refr_dev`` the refraction cap (0 or 2).
    ``strict_parity`` applies the reference's float32 narrowings (only
    meaningful when tracing in float64 on CPU for oracle comparison).
    """

    num_rays: int
    max_refl_dev: int
    max_refr_dev: int
    interpolate_smooth: bool = True
    strict_parity: bool = False
    tri_chunk: int = 512
    # acceleration structure: "brute" = dense matmul Möller–Trumbore over
    # all triangles; "cluster" = Morton-clustered Pallas traversal with
    # AABB culling (requires a cluster_reorder'ed scene, float32).
    accel: str = "brute"
    cluster_size: int = 256
    ray_tile: int = 512
    group_size: int = 16  # clusters per supercluster
    super_size: int = 1  # groups per super²cluster; 1 = 2-level (measured best at <=1M tris)
    sub_tiles: int = 4  # ray sub-blocks per tile, each slab-gated in the kernel
    # Per-tile candidate-list width for the two-phase traversal (phase 1
    # builds near-to-far candidate clusters in vectorised XLA; the kernel
    # loops only over them).  0 = the original hierarchical sweep.
    candidates: int = 64
    # Candidates per MT evaluation window in the kernel (1/2/4/8/16/32): G
    # candidates' packed tiles are evaluated as ONE [rows, G*cs] block
    # gated by the union of their phase-1 bits — amortises loop/branch/
    # epilogue cost so finer clusters stay cheap (bit-identical).
    mt_group: int = 2
    # True: one G*cs-wide union-gated MT evaluation per loop step; False:
    # G-unrolled loop with per-candidate cs-wide windows and bits (no
    # union waste, more branches) — measured slower, kept as an option.
    mt_union: bool = True
    # Half-width tail window (with mt_union): pad candidate lists to
    # G/2 and evaluate one G/2-wide window when the remainder fits —
    # trims padded-duplicate columns (bit-identical; docs/PERF.md).
    mt_tail: bool = False
    # Running-best candidate-window prune: skip a sub-block's MT when
    # the window's nearest candidate entry distance (phase-1 per-tile
    # min, floor-quantised 1/16 m) exceeds every row's current best t.
    # Exact/bit-identical; built for closed-shell scenes where front
    # faces occlude back faces and farther targets (docs/PERF.md r5b).
    mt_prune: bool = False
    # Candidate-list order within a tile: "near" (near-to-far entry
    # distance) or "mask" (grouped by sub-block overlap bitmask so
    # G-window union gates stay tight; near-to-far within equal masks).
    cand_order: str = "near"
    # >0: gather the union of all tiles' candidate clusters (the live
    # set — ~53 clusters on the 63³ bench) into a VMEM-resident pack
    # once per segment; candidate windows then assemble by VMEM-local
    # copies instead of HBM DMAs.  Bit-identical; live sets beyond the
    # cap fall back to the hierarchical sweep (correct, slow).  0 = off.
    resident_cap: int = 0
    # Phase-1 hierarchy knobs (None = ops/cluster_trace module defaults):
    # clusters per level-1 supergroup box, and max admitted supergroups
    # per tile (level-2 width = p1_super_k * p1_fanout box slots; tiles
    # admitting more overflow to the kernel's full hierarchical sweep).
    p1_fanout: int | None = None
    p1_super_k: int | None = None
    # Level-0 knobs (fire when supergroup count >= the module threshold):
    # supergroups per level-0 run, and max admitted runs per tile — the
    # level-1 re-test width is p1_super_k0 * p1_fanout0 box slots, so a
    # tight K0 (terrain admits ~2-4 runs/tile) cuts wasted slab work.
    p1_fanout0: int | None = None
    p1_super_k0: int | None = None
    # Fan tile order: "raster" (reference launch order), "morton3"
    # (3-D Morton over iz/iy/ix) or "morton2" (2-D Morton over the two
    # direction-bearing axes iz/iy with the launch-range axis ix minor —
    # compact square angular patches, the right order for candidate-list
    # traversal).  Results are inverse-permuted back to launch order.
    fan_order: str = "raster"

    @property
    def fan_tiling(self) -> bool:
        return self.fan_order != "raster"
    # Compact active lanes to the front once refraction spawning is over,
    # so late segments only traverse live tiles.  Wins when most of the
    # fan misses at segment 1; loses (sort+permute overhead) when the fan
    # mostly hits, as in the bench scenes — default off.
    compact_lanes: bool = False
    # Tile-granular narrow late segments (accel="cluster"): once the
    # live ray tiles of a post-spawn segment fit ceil(tiles/N) tiles,
    # gather just those tiles (plus the partial tail tile), trace the
    # narrow block and scatter rows back — phase 1 and shading then pay
    # ~1/N of their static-shape cost on nearly-dead segments, and a
    # lax.cond keeps full width while too many tiles are alive
    # (bit-identical either way).  0/1 = off; -1 = AUTO (live-tile
    # budget max(8, tiles//32), the measured sweet spot across fan
    # sizes — docs/PERF.md r3k narrow sweep).
    compact_narrow: int = 0
    interpret: bool = False  # run the Pallas kernel in interpreter mode (CPU tests)
    # Extended-precision (double-single) path replay: after the f32 trace,
    # re-evaluate ray_length/power/doppler along the recorded chains so
    # the f32 engine meets the reference's double-precision 1e-6
    # power/phase contract (engine/replay.py).  Requires a SceneBase
    # built with with_lo=True and a PulseBatch carrying RefineExtras.
    refine: bool = False
    # 0 = replay every lane; N = compact received lanes to the front and
    # replay only an N-row block (received counts are typically a few
    # hundred of ~1e5 lanes; overflowing lanes keep their f32 values).
    replay_cap: int = 0
    # Aggregation compaction: aggregate a gathered block of the received
    # lanes instead of running every [lanes, bins] pass over the full fan
    # (aggregate/paths.py compact_cap; measured 2.6 ms/pulse at the 63³
    # production bench).  Unlike replay_cap, overflow does NOT degrade
    # anything: a lax.cond falls back to the full-lane path when more
    # than agg_cap lanes were received.  0 disables.
    agg_cap: int = 4096
    # Fused shade-emit: the traversal kernel extracts the winner's shade
    # fields (base corner normals + target id, the [T, 10] shade_pack row
    # the hit body would otherwise row-gather — docs/PERF.md r4e measured
    # that gather at 3.03 ms/pulse, address-generation-bound in XLA) in
    # its one-hot argmin epilogue and returns them as extra packed output
    # rows.  Trades ~XLA-gather row cost for in-kernel VPU masked sums;
    # bit-identical (the emitted values are exact copies of the same
    # table rows; no-hit lanes differ only in never-observed fields).
    # Requires accel="cluster" + interpolate_smooth + packed kernel I/O;
    # silently falls back to the gather where unavailable.  MEASURED
    # NO-GO on hardware (−2 to −6% in every variant, docs/PERF.md r5a) —
    # kept as a documented opt-in like resident_cap.
    shade_emit: bool = False
    # Record per-bounce RCS angle sums (normal_shader.cu:259-265,319-326)
    # into the [2, D, R] rcs buffer.  When every target's RCS model is
    # aspect-free (IsoRCS/SphereRCS ignore the angles entirely,
    # physics/rcs.py), the recorded values are never read by
    # postprocess — prepare_cpi auto-disables this, which statically
    # elides 6 arctan2 chains + two [2, D, R] one-hot scatters per
    # segment from the hit body (the buffer keeps its init sentinel).
    rcs_angles: bool = True

    @classmethod
    def from_parameters(cls, p: Parameters, **kw) -> "TraceConfig":
        return cls(
            num_rays=p.num_rays,
            max_refl_dev=p.max_refl_depth + 1,
            max_refr_dev=p.max_refr_depth,
            interpolate_smooth=p.interpolate_smooth,
            **kw,
        )

    @property
    def rays_per_fan(self) -> int:
        return self.num_rays**3

    @property
    def refraction_on(self) -> bool:
        return self.max_refr_dev == 2

    @property
    def slot_multiplier(self) -> int:
        # ray_tracer.cpp:608-623: 1 + (max_refl + 1) + 1 with refraction.
        return ((self.max_refl_dev - 1) + 3) if self.refraction_on else 1

    @property
    def ray_total(self) -> int:
        return self.slot_multiplier * self.rays_per_fan

    @property
    def depth_total(self) -> int:
        return (self.max_refl_dev - 1) + self.max_refr_dev

    @property
    def tri_seq_width(self) -> int:
        """Chain-record width for the ds replay: one slot per possible
        gated hit (col = refl+refr is monotone along a chain and bounded
        by depth_total)."""
        return self.depth_total + 1

    @property
    def num_segments(self) -> int:
        """Static wavefront iteration count: a chain traces at most
        ``max_refl_dev + 1`` segments and the deepest chain (the exiting
        refraction) starts two iterations late."""
        extra = 2 if self.refraction_on else 0
        return self.max_refl_dev + 1 + extra
