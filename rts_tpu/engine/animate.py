"""In-jit scene animation: static base mesh + per-pulse transforms.

The reference rebuilds every target mesh on the host each pulse and marks
the BVH dirty (ray_tracer.cpp:936-1146, 1125-1130) — the slowest part of
its pipeline at scale.  TPU-native replacement: compile the scene ONCE
(topology and t=0-rotated geometry are time-invariant), then apply the
per-pulse rigid transform (rotation + translation) to the triangle soup
*inside* jit, so a whole CPI batches over the pulse axis with no host
round-trips.

Transform semantics match the driver / reference exactly: the base mesh
already carries the t=0 attitude; a rotating target gets the extra
R(yaw,pitch,roll at t) applied ON TOP (composite, ray_tracer.cpp:993-1007),
then the centre translation (:1010-1014).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rts_tpu.core.rotation import rot_zyx
from rts_tpu.engine.types import DeviceScene, derive_tri_arrays
from rts_tpu.geometry.scene import SceneArrays


class SceneBase(NamedTuple):
    """Time-invariant scene: target-frame triangle soup + materials.

    ``tri_verts_t`` is the host-transposed [9, T] corner-component layout
    (row = corner*3 + axis) consumed by the component-wise packed
    animation path — transposing [T, 3, 3] on device every pulse is a
    strided relayout TPU hates.
    """

    tri_verts: jnp.ndarray  # [T, 3, 3] corner positions (t=0 attitude, origin-centred)
    tri_verts_t: jnp.ndarray  # [9, T] same data, component-major
    tri_corner_normals: jnp.ndarray  # [T, 3, 3] (t=0 attitude — rotated per hit, not per pulse)
    tri_target: jnp.ndarray  # [T] int32, -1 padding
    # Fused hit-shading table [T, 10]: cols 0-8 the corner normals,
    # col 9 the target id as a float (exact: |NT| << 2^23).  One gather
    # per hit lane instead of two from separate [T, 3, 3] / [T] tables
    # (the two share indices; XLA does not merge them).
    shade_pack: jnp.ndarray  # [T, 10] (see above)
    # The same 10 fields component-major ([10, T], host-transposed once):
    # the rows appended to the traversal pack when the kernel emits shade
    # in its epilogue (TraceConfig.shade_emit) — a device transpose per
    # pulse would be a strided relayout.
    shade_pack_t: jnp.ndarray  # [10, T]
    target_refl: jnp.ndarray  # [NT]
    target_refr: jnp.ndarray  # [NT]
    # ds residuals (f64 minus f32) for the extended-precision replay
    # (engine/replay.py); None unless built with ``with_lo=True``.
    tri_verts_lo: jnp.ndarray = None
    tri_corner_normals_lo: jnp.ndarray = None
    target_refl_lo: jnp.ndarray = None
    target_refr_lo: jnp.ndarray = None
    # Per-cluster, per-target BASE AABBs ([C, NT, 3] + validity [C, NT]):
    # the O(C*NT) corner-transform refit replaces the per-pulse O(T)
    # min/max reduction over all animated vertices.  None unless built
    # with ``cluster_size=`` (the clustered engine).
    cl_mn: jnp.ndarray = None
    cl_mx: jnp.ndarray = None
    cl_valid: jnp.ndarray = None

    @property
    def num_targets(self) -> int:
        return int(self.target_refl.shape[0])


def _lo32(a64) -> jnp.ndarray:
    """float64 array -> the f32 residual of its f32 rounding."""
    a64 = np.asarray(a64, np.float64)
    hi = a64.astype(np.float32)
    return jnp.asarray((a64 - hi.astype(np.float64)).astype(np.float32))


def scene_base(
    scene: SceneArrays, dtype=jnp.float32, with_lo: bool = False, cluster_size: int = 0
) -> SceneBase:
    tv = np.asarray(scene.tri_verts)
    lo = {}
    if with_lo:
        lo = dict(
            tri_verts_lo=_lo32(tv),
            tri_corner_normals_lo=_lo32(scene.tri_normals),
            target_refl_lo=_lo32(scene.target_refl_coeff),
            target_refr_lo=_lo32(scene.target_refr_index),
        )
    if cluster_size:
        # Per-cluster, per-target base boxes over the SAME dtype-rounded
        # vertices the per-pulse pack transform consumes, so the corner
        # refit (animate_packed) stays conservative.
        tv_r = tv.astype(np.dtype(dtype)).astype(np.float64)  # [T, 3, 3]
        tt = np.asarray(scene.tri_target)
        nt = max(len(scene.target_refl_coeff), 1)
        c = tv.shape[0] // cluster_size
        pts = tv_r.reshape(c, cluster_size, 3, 3)
        tid = tt.reshape(c, cluster_size)
        mn = np.full((c, nt, 3), np.inf)
        mx = np.full((c, nt, 3), -np.inf)
        valid = np.zeros((c, nt), bool)
        for j in range(nt):
            m = (tid == j)[..., None, None]  # [c, cs, 1, 1]
            mn[:, j] = np.where(m, pts, np.inf).min(axis=(1, 2))
            mx[:, j] = np.where(m, pts, -np.inf).max(axis=(1, 2))
            valid[:, j] = (tid == j).any(axis=1)
        lo.update(
            cl_mn=jnp.asarray(mn, dtype),
            cl_mx=jnp.asarray(mx, dtype),
            cl_valid=jnp.asarray(valid),
        )
    nrm = np.asarray(scene.tri_normals, np.dtype(dtype)).reshape(-1, 9)
    shade = np.concatenate(
        [nrm, np.asarray(scene.tri_target, np.dtype(dtype))[:, None]], axis=1
    )
    return SceneBase(
        tri_verts=jnp.asarray(tv, dtype),
        tri_verts_t=jnp.asarray(np.ascontiguousarray(tv.reshape(-1, 9).T), dtype),
        tri_corner_normals=jnp.asarray(scene.tri_normals, dtype),
        tri_target=jnp.asarray(scene.tri_target, jnp.int32),
        shade_pack=jnp.asarray(shade, dtype),
        shade_pack_t=jnp.asarray(np.ascontiguousarray(shade.T), dtype),
        target_refl=jnp.asarray(scene.target_refl_coeff, dtype),
        target_refr=jnp.asarray(scene.target_refr_index, dtype),
        **lo,
    )


def animate_scene(
    base: SceneBase,
    rot: jnp.ndarray,  # [NT, 3, 3] extra attitude rotation at pulse time
    pos: jnp.ndarray,  # [NT, 3] target centres at pulse time
    vel: jnp.ndarray,  # [NT, 3] finite-difference velocities
) -> DeviceScene:
    """Rigid-transform the soup and re-derive intersection precomputes.

    Padding triangles (target -1) stay all-zero-edged and unhittable.
    """
    nt = base.target_refl.shape[0]
    tid = jnp.clip(base.tri_target, 0, nt - 1)
    r = rot[tid]  # [T, 3, 3]
    shift = jnp.where((base.tri_target >= 0)[:, None], pos[tid], 0.0)
    verts = jnp.einsum("tij,tcj->tci", r, base.tri_verts) + shift[:, None, :]
    normals = jnp.einsum("tij,tcj->tci", r, base.tri_corner_normals)
    p0, e0, e1, n, c1, c0, np0 = derive_tri_arrays(verts)
    return DeviceScene(
        tri_p0=p0,
        tri_e0=e0,
        tri_e1=e1,
        tri_n=n,
        tri_c1=c1,
        tri_c0=c0,
        tri_np0=np0,
        tri_corner_normals=normals,
        tri_target=base.tri_target,
        target_refl=base.target_refl,
        target_refr=base.target_refr,
        target_vel=vel,
    )


class ClusterScene(NamedTuple):
    """Per-pulse scene in the clustered engine's native layout.

    Traversal consumes the packed [16, T] field matrix and cluster AABBs
    directly; shading rotates *gathered* base normals by the per-target
    attitude at hit time (O(lanes), not O(T) — rotation is linear, so it
    commutes with barycentric interpolation).
    """

    # [16, T] rows: n(3) c1(3) c0(3) e1(3) e0(3) np0 — or [32, T] with
    # the static shade rows 16-25 appended + 6 zero pad rows
    # (animate_packed shade_rows; Mosaic 8-sublane DMA alignment)
    tri_pack: jnp.ndarray
    aabb_mn: jnp.ndarray  # [C, 3]
    aabb_mx: jnp.ndarray  # [C, 3]
    base_corner_normals: jnp.ndarray  # [T, 3, 3] t=0 attitude (static)
    shade_pack: jnp.ndarray  # [T, 10] corner normals + target-as-float (SceneBase)
    rot: jnp.ndarray  # [NT, 3, 3] extra attitude rotation this pulse
    tri_target: jnp.ndarray  # [T] int32
    target_refl: jnp.ndarray  # [NT]
    target_refr: jnp.ndarray  # [NT]
    target_vel: jnp.ndarray  # [NT, 3]


def animate_packed(
    base: SceneBase,
    rot: jnp.ndarray,  # [NT, 3, 3]
    pos: jnp.ndarray,  # [NT, 3]
    vel: jnp.ndarray,  # [NT, 3]
    cluster_size: int,
    shade_rows: bool = False,  # append shade rows + pad -> [32, T]
) -> ClusterScene:
    """Rigid-transform straight into the traversal kernel's layout.

    Everything is component-wise over [T] rows (9 rotation gathers + a
    few dozen fused VPU ops) — no [T, 3, 3] einsum, no device transposes.
    """
    nt = base.target_refl.shape[0]
    tid = jnp.clip(base.tri_target, 0, nt - 1)
    pad = base.tri_target < 0

    # Per-tri rotation/translation via one-hot matmul: XLA lowers a
    # 1M-index gather from a tiny [NT, 9] operand pathologically (~15 ms
    # at 1M tris); onehot[T, NT] @ rot[NT, 9] is a dense K=NT contraction
    # that runs at memory speed.
    dtype = base.tri_verts_t.dtype
    onehot = (tid[:, None] == jnp.arange(nt, dtype=jnp.int32)[None, :]).astype(dtype)
    rot9 = rot.reshape(nt, 9).astype(dtype)
    # Precision pinned per-call: a user's jax.default_matmul_precision
    # context would otherwise demote these f32 one-hot gathers to bf16
    # and silently corrupt the rotation components (TPU-only).
    hi = jax.lax.Precision.HIGHEST
    r = [jnp.matmul(onehot, rot9[:, i], precision=hi) for i in range(9)]
    pos_t = pos.astype(dtype)
    s = [jnp.where(pad, 0.0, jnp.matmul(onehot, pos_t[:, i], precision=hi)) for i in range(3)]
    v = base.tri_verts_t  # [9, T], rows corner*3 + axis

    def corner(c):
        bx, by, bz = v[3 * c + 0], v[3 * c + 1], v[3 * c + 2]
        return (
            r[0] * bx + r[1] * by + r[2] * bz + s[0],
            r[3] * bx + r[4] * by + r[5] * bz + s[1],
            r[6] * bx + r[7] * by + r[8] * bz + s[2],
        )

    p0 = corner(0)
    p1 = corner(1)
    p2 = corner(2)
    e0 = tuple(p1[i] - p0[i] for i in range(3))
    e1 = tuple(p0[i] - p2[i] for i in range(3))

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    n = cross(e1, e0)
    c1 = cross(p0, e1)
    c0 = cross(p0, e0)
    np0 = n[0] * p0[0] + n[1] * p0[1] + n[2] * p0[2]
    tri_pack = jnp.stack([*n, *c1, *c0, *e1, *e0, np0], axis=0)
    if shade_rows:
        # Shade-emit pack (TraceConfig.shade_emit): rows 16-25 hold the
        # STATIC shade fields (base corner normals + target-as-float) so
        # each candidate-window DMA carries the winner's shade data and
        # the kernel epilogue can emit it — the rows are time-invariant
        # (normals are rotated per HIT lane, not per pulse), so this is
        # one broadcast copy per pulse, not extra per-pulse math.  Rows
        # 26-31 are zero padding: Mosaic HBM memref slices must be
        # 8-sublane-aligned in the leading dim (a 26-row DMA slice fails
        # to lower on real TPU; the physical tiling pads to 32 anyway).
        t = tri_pack.shape[1]
        tri_pack = jnp.concatenate(
            [
                tri_pack,
                base.shade_pack_t.astype(tri_pack.dtype),
                jnp.zeros((6, t), tri_pack.dtype),
            ],
            axis=0,
        )

    big = jnp.asarray(3.0e38, v.dtype)
    inf = jnp.asarray(float("inf"), v.dtype)
    if base.cl_mn is not None:
        # Corner refit: transform the per-cluster per-target BASE boxes by
        # the rigid motion — O(C*NT) instead of a min/max reduction over
        # all T animated vertices.  For box [mn, mx] under x -> R x + s,
        # the tight bound of the transformed box is
        #   mn'_i = sum_j min(R_ij mn_j, R_ij mx_j) + s_i  (and max for mx'),
        # conservative for the geometry inside (box >= hull of contents).
        rot_d = rot.astype(dtype)
        rp = jnp.maximum(rot_d, 0.0)
        rn = jnp.minimum(rot_d, 0.0)
        cmn = jnp.where(base.cl_valid[..., None], base.cl_mn, 0.0)
        cmx = jnp.where(base.cl_valid[..., None], base.cl_mx, 0.0)
        new_mn = (
            jnp.einsum("tij,ctj->cti", rp, cmn, precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("tij,ctj->cti", rn, cmx, precision=jax.lax.Precision.HIGHEST)
            + pos_t[None]
        )
        new_mx = (
            jnp.einsum("tij,ctj->cti", rp, cmx, precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("tij,ctj->cti", rn, cmn, precision=jax.lax.Precision.HIGHEST)
            + pos_t[None]
        )
        # dilate by the f32 transform rounding bound so the box still
        # contains every per-triangle-transformed vertex (the pack path
        # rounds each mul/add independently); ~1e-5 relative is >> any
        # few-ulp discrepancy and culling-negligible
        span = jnp.abs(cmx - cmn).max(axis=-1, keepdims=True)
        eps = 1e-5 * (jnp.abs(new_mn) + jnp.abs(new_mx) + span) + 1e-4
        new_mn = new_mn - eps
        new_mx = new_mx + eps
        vmask = base.cl_valid[..., None]
        aabb_mn = jnp.min(jnp.where(vmask, new_mn, big), axis=1)  # [C, 3]
        aabb_mx = jnp.max(jnp.where(vmask, new_mx, -big), axis=1)
        none_valid = ~jnp.any(base.cl_valid, axis=1)[:, None]
        aabb_mn = jnp.where(none_valid, inf, aabb_mn)
        aabb_mx = jnp.where(none_valid, inf, aabb_mx)
    else:
        # cluster AABBs from the corner components; all-padding clusters
        # get the self-rejecting [+inf, +inf] sentinel (inverted boxes
        # would be un-inverted by the slab test's min/max — see
        # ops/cluster_trace)
        t = v.shape[1]
        c_count = t // cluster_size
        mns, mxs = [], []
        for axis in range(3):
            comps = jnp.stack([p0[axis], p1[axis], p2[axis]], axis=0)  # [3, T]
            lo = jnp.where(pad[None, :], big, comps).reshape(3, c_count, cluster_size)
            hi = jnp.where(pad[None, :], -big, comps).reshape(3, c_count, cluster_size)
            mns.append(lo.min(axis=(0, 2)))
            mxs.append(hi.max(axis=(0, 2)))
        aabb_mn = jnp.stack(mns, axis=1)
        aabb_mx = jnp.stack(mxs, axis=1)
        inv_box = aabb_mn > aabb_mx
        aabb_mn = jnp.where(inv_box, inf, aabb_mn)
        aabb_mx = jnp.where(inv_box, inf, aabb_mx)

    return ClusterScene(
        tri_pack=tri_pack,
        aabb_mn=aabb_mn,
        aabb_mx=aabb_mx,
        base_corner_normals=base.tri_corner_normals,
        shade_pack=base.shade_pack,
        rot=rot,
        tri_target=base.tri_target,
        target_refl=base.target_refl,
        target_refr=base.target_refr,
        target_vel=vel,
    )


def attitude_rotations(
    targets,
    times: np.ndarray,  # [P] pulse times
    start_time: float,
) -> np.ndarray:
    """Host-side [P, NT, 3, 3] extra-rotation matrices.

    Identity unless the target is rotating AND t > start_time
    (ray_tracer.cpp:996-1003); the time-varying angles are double
    precision (unlike the float-narrowed t=0 angles).
    """
    p, nt = len(times), len(targets)
    times = np.asarray(times, np.float64)
    out = np.tile(np.eye(3), (p, max(nt, 1), 1, 1))
    live = times > start_time
    for j, targ in enumerate(targets):
        if not targ.attitude.is_rotating or not live.any():
            continue
        # constant-rate attitude: vectorise rot_zyx over the pulse axis
        yaw, pitch, roll = (np.broadcast_to(a, times.shape) for a in targ.attitude.ypr(times))
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        cr, sr = np.cos(roll), np.sin(roll)
        rz = np.zeros((p, 3, 3))
        rz[:, 0, 0], rz[:, 0, 1] = cy, -sy
        rz[:, 1, 0], rz[:, 1, 1] = sy, cy
        rz[:, 2, 2] = 1.0
        ry = np.zeros((p, 3, 3))
        ry[:, 0, 0], ry[:, 0, 2] = cp, sp
        ry[:, 1, 1] = 1.0
        ry[:, 2, 0], ry[:, 2, 2] = -sp, cp
        rx = np.zeros((p, 3, 3))
        rx[:, 0, 0] = 1.0
        rx[:, 1, 1], rx[:, 1, 2] = cr, -sr
        rx[:, 2, 1], rx[:, 2, 2] = sr, cr
        r = rz @ ry @ rx  # Rz·Ry·Rx (ray_tracer.cpp:156-170)
        out[live, j] = r[live]
    return out


def target_motion(
    targets,
    times: np.ndarray,  # [P]
    sample_time: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side positions [P, NT, 3] and finite-difference velocities
    [P, NT, 3] (ray_tracer.cpp:941-948)."""
    p, nt = len(times), len(targets)
    times = np.asarray(times, np.float64)
    pos = np.zeros((p, max(nt, 1), 3))
    vel = np.zeros((p, max(nt, 1), 3))
    for j, targ in enumerate(targets):
        a = np.asarray(targ.GetPosition(times), np.float64).reshape(p, 3)
        b = np.asarray(targ.GetPosition(times + sample_time), np.float64).reshape(p, 3)
        pos[:, j] = a
        vel[:, j] = (b - a) / sample_time
    return pos, vel
