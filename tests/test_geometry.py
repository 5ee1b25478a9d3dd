"""Unit tests for mesh generators vs closed forms (SURVEY.md §4 item 1)."""

import numpy as np
import pytest

from rts_tpu.geometry import Mesh, file_mesh, rect_mesh, sphere_mesh, write_mesh_files


class TestRectMesh:
    def test_counts_and_extents(self):
        m = rect_mesh(2.0, 4.0, 6.0)
        assert m.num_verts == 8
        assert m.num_tris == 12
        assert m.face_normal_mode  # 12 normals > 8 verts
        assert np.allclose(m.verts.min(axis=0), [-1, -2, -3])
        assert np.allclose(m.verts.max(axis=0), [1, 2, 3])

    def test_face_normals_unit_and_outward(self):
        m = rect_mesh(2.0, 2.0, 2.0)
        assert np.allclose(np.linalg.norm(m.normals, axis=-1), 1.0)
        # Every face normal of an origin-centred box must point away from
        # the origin through the triangle centroid.
        centroids = m.verts[m.tris].mean(axis=1)
        assert np.all(np.sum(centroids * m.normals, axis=-1) > 0)

    def test_total_surface_area(self):
        w, h, d = 2.0, 3.0, 5.0
        m = rect_mesh(w, h, d)
        p = m.verts[m.tris]
        areas = 0.5 * np.linalg.norm(np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1)
        assert np.isclose(areas.sum(), 2 * (w * h + h * d + w * d))

    def test_rotation_preserves_shape(self):
        m0 = rect_mesh(1.0, 2.0, 3.0)
        m1 = rect_mesh(1.0, 2.0, 3.0, yaw=0.3, pitch=-0.2, roll=1.1)
        d0 = np.sort(np.linalg.norm(m0.verts[:, None] - m0.verts[None], axis=-1).ravel())
        d1 = np.sort(np.linalg.norm(m1.verts[:, None] - m1.verts[None], axis=-1).ravel())
        assert np.allclose(d0, d1)

    def test_yaw_rotation_matches_closed_form(self):
        yaw = np.float64(np.float32(0.7))  # parity: float-narrowed angle
        m = rect_mesh(2.0, 2.0, 2.0, yaw=0.7)
        m0 = rect_mesh(2.0, 2.0, 2.0)
        rz = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ]
        )
        assert np.allclose(m.verts, m0.verts @ rz.T, atol=1e-14)


class TestSphereMesh:
    @pytest.mark.parametrize("n", [0, 1, 2, 3])
    def test_euler_counts(self, n):
        mesh, num_tris = sphere_mesh(n, 1.0)
        faces = 20 * 4**n
        assert num_tris == faces
        assert mesh.num_tris == faces  # dedup must not lose faces
        # Closed icosphere: V = 2 + F/2 (Euler characteristic 2).
        assert mesh.num_verts == 2 + faces // 2

    def test_vertices_on_sphere_and_normals_unit(self):
        mesh, _ = sphere_mesh(2, 5.0)
        assert np.allclose(np.linalg.norm(mesh.verts, axis=-1), 5.0)
        assert np.allclose(np.linalg.norm(mesh.normals, axis=-1), 1.0)
        # Normals are the unit vertices (ray_tracer.cpp:409).
        assert np.allclose(mesh.normals * 5.0, mesh.verts)

    def test_surface_area_converges(self):
        r = 2.0
        mesh, _ = sphere_mesh(3, r)
        p = mesh.verts[mesh.tris]
        area = 0.5 * np.linalg.norm(np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1).sum()
        assert abs(area - 4 * np.pi * r**2) / (4 * np.pi * r**2) < 0.02

    def test_watertight(self):
        mesh, _ = sphere_mesh(1, 1.0)
        # Every edge must be shared by exactly two faces.
        edges = np.concatenate(
            [mesh.tris[:, [0, 1]], mesh.tris[:, [1, 2]], mesh.tris[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2)


class TestFileMesh:
    def test_roundtrip(self, tmp_path):
        src, _ = sphere_mesh(1, 3.0)
        vf, nf = str(tmp_path / "v.txt"), str(tmp_path / "n.txt")
        write_mesh_files(src, vf, nf)
        loaded = file_mesh(vf, nf)
        assert loaded.num_tris == src.num_tris
        assert np.allclose(loaded.verts[loaded.tris], src.verts[src.tris])
        assert np.allclose(loaded.normals[loaded.tris], src.corner_normals())
        assert not loaded.face_normal_mode

    def test_rotation_applied_to_both(self, tmp_path):
        src, _ = sphere_mesh(0, 1.0)
        vf, nf = str(tmp_path / "v.txt"), str(tmp_path / "n.txt")
        write_mesh_files(src, vf, nf)
        rot = file_mesh(vf, nf, yaw=0.5)
        base = file_mesh(vf, nf)
        yaw = np.float64(np.float32(0.5))
        rz = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
        )
        assert np.allclose(rot.verts, base.verts @ rz.T, atol=1e-14)
        assert np.allclose(rot.normals, base.normals @ rz.T, atol=1e-14)


class TestCornerNormals:
    def test_face_mode_repeats(self):
        m = rect_mesh(1.0, 1.0, 1.0)
        cn = m.corner_normals()
        assert cn.shape == (12, 3, 3)
        assert np.allclose(cn[:, 0], cn[:, 1])
        assert np.allclose(cn[:, 0], m.normals)

    def test_vertex_mode_gathers(self):
        m, _ = sphere_mesh(0, 1.0)
        cn = m.corner_normals()
        assert np.allclose(cn, m.normals[m.tris])
