"""Tests for PLY I/O, voxel grid, normals, synthetic generation, validation."""

import math
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from objective_slam_tpu.utils import ply, pointcloud as pc, synthetic, validation


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    path = tmp_path / "c.ply"
    ply.write_ply(path, pts, nrm, binary=True)
    cloud = ply.read_ply(path)
    np.testing.assert_array_equal(cloud.points, pts)
    np.testing.assert_array_equal(cloud.normals, nrm)


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    path = tmp_path / "c.ply"
    ply.write_ply(path, pts, None, binary=False)
    cloud = ply.read_ply(path)
    np.testing.assert_allclose(cloud.points, pts, rtol=1e-6)
    assert cloud.normals is None


def test_ply_faces_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    path = tmp_path / "m.ply"
    ply.write_ply(path, pts, None, binary=True, faces=faces)
    cloud = ply.read_ply(path)
    np.testing.assert_array_equal(cloud.faces, faces)


def test_voxel_downsample_matches_numpy(rng):
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    leaf = 0.2
    out = pc.voxel_downsample(pts, nrm, leaf)
    np_p, np_n = pc.voxel_downsample_np(pts, nrm, leaf)
    nv = int(out.num_voxels)
    assert nv == len(np_p)
    assert not bool(out.dropped)
    got_p = np.asarray(out.points)[:nv]
    got_n = np.asarray(out.normals)[:nv]
    # Same voxel set; order is by linear cell key in both paths.
    np.testing.assert_allclose(np.sort(got_p, axis=0), np.sort(np_p, axis=0),
                               atol=1e-5)
    np.testing.assert_allclose(np.sort(got_n, axis=0), np.sort(np_n, axis=0),
                               atol=1e-5)


def test_voxel_downsample_padding_is_unmatchable(rng):
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    out = pc.voxel_downsample(pts, nrm, 0.5)
    nv = int(out.num_voxels)
    pad = np.asarray(out.points)[nv:]
    assert (pad < -1e6).all()


def test_voxel_downsample_normal_aware_keeps_thin_slab_sides(rng):
    # A slab 0.02 thick inside a 0.5 leaf: plain centroid mode collapses
    # both faces into one cell whose averaged normal cancels to ~0;
    # normal-aware octant keys keep one point PER FACE with its true
    # normal. This is the thin-real-geometry failure (scanned bone blades
    # and shells lose every match without it).
    xy = rng.uniform(0, 2, size=(200, 2)).astype(np.float32)
    top = np.concatenate([xy, np.full((200, 1), 0.26, np.float32)], axis=1)
    bot = np.concatenate([xy, np.full((200, 1), 0.24, np.float32)], axis=1)
    pts = np.concatenate([top, bot])
    nrm = np.concatenate([np.tile([0, 0, 1.0], (200, 1)),
                          np.tile([0, 0, -1.0], (200, 1))]).astype(np.float32)
    leaf = 0.5

    # Plain mode: every surviving cell mixes both faces -> normal ~ 0.
    p0, n0 = pc.voxel_downsample_np(pts, nrm, leaf)
    assert np.abs(n0[:, 2]).max() < 1e-6
    # Normal-aware: each face keeps its own voxels with unit ±z normals.
    p1, n1 = pc.voxel_downsample_np(pts, nrm, leaf, normal_aware=True)
    assert len(p1) == 2 * len(p0)
    np.testing.assert_allclose(np.abs(n1[:, 2]), 1.0, atol=1e-6)
    assert (n1[:, 2] > 0).sum() == len(p0)

    # Device path agrees with the host path (same voxel set + normals).
    out = pc.voxel_downsample(pts, nrm, leaf, normal_aware=True)
    nv = int(out.num_voxels)
    assert nv == len(p1)
    got_p = np.asarray(out.points)[:nv]
    got_n = np.asarray(out.normals)[:nv]
    np.testing.assert_allclose(np.sort(got_p, axis=0), np.sort(p1, axis=0),
                               atol=1e-5)
    np.testing.assert_allclose(np.sort(got_n, axis=0), np.sort(n1, axis=0),
                               atol=1e-5)


def test_voxel_capacity_overflow(rng):
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    nrm = np.ones((100, 3), np.float32)
    out = pc.voxel_downsample(pts, nrm, 0.01, capacity=4)
    assert bool(out.dropped)


def test_sample_mesh_surface_uniform_on_sphere(rng):
    # Area-weighted sampling of a (near-)sphere mesh: points at radius ~1,
    # interpolated normals unit-length and outward, and coverage uniform
    # enough that every octant receives its ~1/8 share (raw decimated-mesh
    # vertices concentrate at high-curvature features; the sampler is what
    # makes real scanned assets behave like range scans).
    from objective_slam_tpu.utils import synthetic
    v, f = synthetic.bumpy_mesh(subdiv=3, bumps=0.0)
    pts, nrm = pc.sample_mesh_surface(v, f, 4000, rng)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=0.02)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    # Outward orientation: normal aligned with the radial direction.
    cos = np.sum(nrm * pts / r[:, None], axis=1)
    assert cos.min() > 0.95
    octant = ((pts[:, 0] > 0).astype(int) + 2 * (pts[:, 1] > 0)
              + 4 * (pts[:, 2] > 0))
    counts = np.bincount(octant, minlength=8)
    assert counts.min() > 0.6 * 4000 / 8


def test_knn_normals_on_plane(rng):
    # Points on z=0 plane -> normals ±z.
    pts = np.concatenate([rng.uniform(0, 1, size=(200, 2)),
                          np.zeros((200, 1))], axis=1).astype(np.float32)
    n = np.asarray(pc.estimate_normals_knn(pts, k=10,
                                           viewpoint=(0.5, 0.5, 5.0)))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
    assert (n[:, 2] > 0).all()  # oriented toward viewpoint above the plane


def test_knn_normals_on_sphere(rng):
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n = np.asarray(pc.estimate_normals_knn(v.astype(np.float32), k=12,
                                           viewpoint=(10.0, 0.0, 0.0)))
    # Normal should align with radial direction (sign flipped toward vp for
    # the visible hemisphere at least); check |cos| large everywhere.
    cos = np.abs(np.sum(n * v, axis=1))
    assert np.quantile(cos, 0.05) > 0.95


def test_grid_normals_on_plane(rng):
    pts = np.concatenate([rng.uniform(0, 1, size=(400, 2)),
                          np.zeros((400, 1))], axis=1).astype(np.float32)
    n = np.asarray(pc.estimate_normals_grid(pts, radius=0.12,
                                            viewpoint=(0.5, 0.5, 5.0)))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert (n[:, 2] > 0).all()


def test_grid_normals_match_knn_on_sphere(rng):
    """The O(n) voxel-grid estimator must agree with the exact n×n kNN
    estimator (its scalable replacement for raw 100k scans)."""
    v = rng.normal(size=(1500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)
    n_grid = np.asarray(pc.estimate_normals_grid(pts, radius=0.15,
                                                 orient="outward"))
    n_knn = np.asarray(pc.estimate_normals_knn(pts, k=12, orient="outward"))
    agree = np.abs(np.sum(n_grid * n_knn, axis=1))
    assert agree.mean() > 0.99
    cos = np.sum(n_grid * v, axis=1)
    assert np.quantile(cos, 0.05) > 0.9   # outward-oriented radial normals


def test_smooth_normals_grid_denoises(rng):
    """Box-averaging a noisy normal field on a sphere must cut the angular
    error substantially while preserving orientation (sign)."""
    v = rng.normal(size=(4000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)
    noisy = v + rng.normal(scale=0.25, size=v.shape)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    noisy = noisy.astype(np.float32)
    sm = np.asarray(pc.smooth_normals_grid(pts, noisy, radius=0.18))
    err_in = np.degrees(np.arccos(np.clip(np.sum(noisy * v, axis=1),
                                          -1, 1)))
    err_out = np.degrees(np.arccos(np.clip(np.sum(sm * v, axis=1),
                                           -1, 1)))
    assert err_out.mean() < 0.5 * err_in.mean(), (err_in.mean(),
                                                  err_out.mean())
    # unit length + orientation preserved
    np.testing.assert_allclose(np.linalg.norm(sm, axis=1), 1.0, atol=1e-4)
    assert (np.sum(sm * v, axis=1) > 0).mean() > 0.99


def test_saturating_total():
    import jax.numpy as jnp
    from objective_slam_tpu.ops import voting

    rows = jnp.asarray([123456, 789, 0, 2**30], jnp.int32)
    exact = int(np.asarray(rows, np.int64).sum())
    assert int(voting.saturating_total(rows)) == exact
    # grand total past int32: saturates to INT32_MAX instead of wrapping
    rows2 = jnp.asarray([2**30, 2**30, 2**30], jnp.int32)
    assert int(voting.saturating_total(rows2)) == 2**31 - 1


def test_bumpy_mesh_is_closed():
    from objective_slam_tpu.utils import synthetic
    verts, faces = synthetic.bumpy_mesh(subdiv=2)
    assert len(verts) == 162 and len(faces) == 320
    # Closed 2-manifold: every edge shared by exactly two faces.
    edges = {}
    for (a, b, c) in faces:
        for e in [(a, b), (b, c), (c, a)]:
            k = (min(e), max(e))
            edges[k] = edges.get(k, 0) + 1
    assert all(v == 2 for v in edges.values())
    # Outward mesh normals align with the radial bump field.
    n = pc.mesh_vertex_normals(verts, faces)
    r = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    assert np.quantile(np.sum(n * r, axis=1), 0.05) > 0.5


def test_partial_view_culling(rng):
    from objective_slam_tpu.utils import synthetic
    v = rng.normal(size=(2000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)                  # unit sphere, radial normals
    vis = synthetic.partial_view(pts, pts, viewpoint=(5.0, 0.0, 0.0))
    frac = vis.mean()
    assert 0.2 < frac < 0.7                     # roughly a hemisphere
    # Every visible point faces the sensor.
    to_vp = np.float32([5.0, 0, 0]) - pts[vis]
    assert (np.sum(pts[vis] * to_vp, axis=1) > 0).all()
    # The far pole is hidden.
    far = pts[:, 0] < -0.5
    assert vis[far].mean() < 0.05


def test_mesh_vertex_normals():
    # Unit square split in two triangles in the z=0 plane.
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = pc.mesh_vertex_normals(pts, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)


def test_bbox_diameter():
    pts = np.array([[0, 0, 0], [3, 1, 2]], np.float32)
    assert pc.bbox_diameter(pts) == 3.0
    assert abs(pc.bbox_center_radius(pts) -
               np.linalg.norm([1.5, 0.5, 1.0])) < 1e-6


def test_center_scene(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32) + 10
    out, T = pc.center_scene(pts)
    np.testing.assert_allclose(out.mean(axis=0), [1, 1, 1], atol=1e-4)
    np.testing.assert_allclose(pts @ T[:3, :3].T + T[:3, 3], out, atol=1e-5)


def test_downsamplers(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    p, n = pc.sequential_downsample(pts, nrm, 5)
    assert p.shape == (20, 3)
    np.testing.assert_array_equal(p, pts[::5])
    p2, n2 = pc.random_downsample(pts, nrm, 0.3)
    assert p2.shape == (30, 3)


def test_shoemake_rotation_uniform(rng):
    # Quaternions are unit; rotation matrices orthonormal.
    for _ in range(20):
        q = synthetic.random_rotation_quat(rng)
        assert abs(np.linalg.norm(q) - 1.0) < 1e-6
        R = synthetic.quat_to_matrix(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_plant_model_ground_truth(rng):
    mp, mn = synthetic.blob_cloud(rng, 40)
    sp, sn, T = synthetic.plant_model(rng, mp, mn)
    # The planted points must equal T applied to the model.
    expect = mp @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(sp, expect, atol=1e-5)
    # Normals rotate only.
    np.testing.assert_allclose(sn, mn @ T[:3, :3].T, atol=1e-5)


def test_validation_roundtrip(tmp_path, rng):
    mp, mn = synthetic.blob_cloud(rng, 30)
    _, _, T = synthetic.plant_model(rng, mp, mn)
    path = tmp_path / "truth.txt"
    validation.write_truth_file(path, T)
    T2 = validation.read_truth_file(path)
    np.testing.assert_allclose(T2, T, rtol=1e-6)
    res = validation.validate_pose(T2, T, model_diameter=2.0)
    assert res.match and res.trans_match and res.rot_match
    # Perturb rotation beyond 12 degrees -> rot mismatch.
    from objective_slam_tpu.ops import transforms as tr
    bad = np.asarray(T2 @ np.asarray(tr.rotx(math.radians(20))))
    res2 = validation.validate_pose(bad, T, model_diameter=2.0)
    assert not res2.rot_match and not res2.match


def test_trans_adj_sidecar(tmp_path, rng):
    """M7 parity: the .trans_adj sidecar records the centering transform."""
    pts = rng.normal(size=(30, 3)).astype(np.float32) + 5.0
    centered, T = pc.center_scene(pts)
    path = tmp_path / "cloud.ply.trans_adj"
    pc.write_trans_adj(path, T)
    T2 = pc.read_trans_adj(path)
    np.testing.assert_allclose(T2, T, rtol=1e-6)
    # Applying the recorded adjustment reproduces the stored cloud.
    np.testing.assert_allclose(pts @ T2[:3, :3].T + T2[:3, 3], centered,
                               atol=1e-5)


def test_debug_dump_roundtrip(tmp_path, rng):
    """C6 parity: raw little-endian binary dumps (util.hpp:55-91 format)."""
    from objective_slam_tpu.utils import debug_dump
    arr = rng.normal(size=(17, 4)).astype(np.float32)
    path = tmp_path / "a.bin"
    debug_dump.dump_array(path, arr)
    assert path.stat().st_size == 17 * 4 * 4
    back = debug_dump.load_array(path, np.float32, (17, 4))
    np.testing.assert_array_equal(back, arr)
    ints = np.arange(10, dtype=np.int32)
    debug_dump.dump_array(tmp_path / "i.bin", jnp.asarray(ints))
    np.testing.assert_array_equal(
        debug_dump.load_array(tmp_path / "i.bin", np.int32), ints)


def test_html_viewer_roundtrip(tmp_path, rng):
    """The interactive WebGL viewer export embeds the exact point data
    (base64 f32) with consistent metadata, subsamples normals at the
    declared stride, and leaves no unexpanded template placeholders."""
    import base64
    import json
    import re

    from objective_slam_tpu.utils import html_viewer

    p1 = rng.normal(size=(50, 3)).astype(np.float32)
    n1 = rng.normal(size=(50, 3)).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    p2 = rng.normal(size=(33, 3)).astype(np.float32)
    path = tmp_path / "view.html"
    html_viewer.write_html_viewer(
        path,
        [{"points": p1, "normals": n1, "name": "scene"},
         {"points": p2, "color": (10, 20, 30), "name": "model"}],
        normal_stride=7)
    text = path.read_text()
    assert "__TITLE__" not in text and "__META__" not in text
    metas = json.loads(re.search(r"const META = (\[.*?\]);", text).group(1))
    blobs = json.loads(re.search(r"const BLOBS = (\[.*?\]);",
                                 text).group(1))
    assert [m["name"] for m in metas] == ["scene", "model"]
    assert metas[1]["color"] == [10, 20, 30]
    got1 = np.frombuffer(base64.b64decode(blobs[metas[0]["points"]]),
                         np.float32).reshape(-1, 3)
    np.testing.assert_array_equal(got1, p1)
    gotn = np.frombuffer(base64.b64decode(blobs[metas[0]["normals"]]),
                         np.float32).reshape(-1, 3)
    np.testing.assert_array_equal(gotn, n1[::7])
    got2 = np.frombuffer(base64.b64decode(blobs[metas[1]["points"]]),
                         np.float32).reshape(-1, 3)
    np.testing.assert_array_equal(got2, p2)
    assert "normals" not in metas[1]
    # Script structure sane: balanced script tags, WebGL entry points.
    assert text.count("<script>") == text.count("</script>") == 1
    for token in ("getContext(\"webgl\"", "drawArrays", "__viewer_ready"):
        assert token in text, token


def test_read_stl_welds_triangle_soup(tmp_path):
    """A binary STL written as a triangle soup (every vertex repeated per
    incident face) is welded back to an indexed mesh: unique vertices,
    consistent faces, degenerate triangles dropped."""
    import struct

    from objective_slam_tpu.utils import ply

    # A tetrahedron: 4 verts, 4 faces -> 12 soup vertices.
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    path = tmp_path / "tet.stl"
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(f) + 1))
        for tri in f:
            fh.write(np.zeros(3, "<f4").tobytes())
            for i in tri:
                fh.write(v[i].astype("<f4").tobytes())
            fh.write(struct.pack("<H", 0))
        # One degenerate sliver (two identical corners) -> must be dropped.
        fh.write(np.zeros(3, "<f4").tobytes())
        for i in (0, 0, 1):
            fh.write(v[i].astype("<f4").tobytes())
        fh.write(struct.pack("<H", 0))

    verts, faces = ply.read_stl(path)
    assert verts.shape == (4, 3)
    assert faces.shape == (4, 3)
    # Same geometry: every original vertex present, faces reference the
    # welded indices consistently (compare face vertex SETS geometrically).
    got = {frozenset(map(tuple, verts[face])) for face in faces}
    want = {frozenset(map(tuple, v[face])) for face in f}
    assert got == want
    # Truncated file raises, not garbage.
    (tmp_path / "bad.stl").write_bytes(b"\0" * 83)
    with pytest.raises(ValueError):
        ply.read_stl(tmp_path / "bad.stl")


def test_real_mesh_models_load():
    """The real scanned-mesh models (dm_control skeleton assets) load, weld
    and scale to the registered UWA diameters (skipped on images without
    dm_control)."""
    import os
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import run_uwa_analog as rua

    if not os.path.isdir(rua.REAL_MESH_DIR):
        pytest.skip("dm_control assets not present")
    from objective_slam_tpu.utils import pointcloud as pc
    import analyze_uwa

    models, normals = rua.build_models_real(n_samples=2000)
    assert set(models) == {"skull", "pelvis", "humerus", "scapula"}
    for name, (pts, _faces) in models.items():
        assert len(pts) == 2000
        # Surface samples span the registered diameter (within the sampled
        # subset's shrinkage) and carry finite unit normals.
        d = pc.bbox_diameter(pts)
        assert 0.9 * analyze_uwa.MODEL_DIAMS[name] < d \
            <= analyze_uwa.MODEL_DIAMS[name] * 1.0001
        n = normals[name]
        assert np.isfinite(n).all()
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0,
                                   atol=1e-4)


def test_smallest_eigvec_sym3_vs_eigh(rng):
    """Closed-form 3x3 min-eigenvector matches numpy eigh (up to sign) on
    generic covariances and stays finite/unit on degenerate ones."""
    from objective_slam_tpu.utils.pointcloud import _smallest_eigvec_sym3

    pts = rng.normal(size=(64, 12, 3)).astype(np.float32)
    pts *= np.float32([1.0, 0.6, 0.15])          # anisotropic -> clear gap
    c = pts - pts.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", c, c) / c.shape[1]
    got = np.asarray(_smallest_eigvec_sym3(jnp.asarray(cov)))
    for i in range(len(cov)):
        w, v = np.linalg.eigh(cov[i])
        want = v[:, 0]
        dot = abs(float(got[i] @ want))
        assert dot > 0.999, (i, dot, w)

    # Degenerate: isotropic (all eigvals equal) and rank-1 (a line) must
    # return finite unit vectors (fallback), not NaN.
    iso = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    line = np.zeros((2, 3, 3), np.float32)
    line[:, 0, 0] = 1.0
    out = np.asarray(_smallest_eigvec_sym3(jnp.asarray(
        np.concatenate([iso, line]))))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # rank-1 line cov: the min-eigenspace is the plane orthogonal to x —
    # the returned vector must be orthogonal to x.
    assert np.all(np.abs(out[2:, 0]) < 1e-3), out[2:]


def test_smooth_normals_grid_order1_cancels_window_bias(rng):
    """On a curved surface the order-0 box average is biased toward the
    window's mean orientation; the order-1 (linear MLS) fit evaluates the
    fitted field AT the query point, cancelling the first-order term.
    Measured on a CLEAN normal field (pure window bias, no noise), order=1
    must carry materially less bias; on a noisy field it must still
    denoise."""
    v = rng.normal(size=(6000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)                      # unit sphere, curvature 1

    def mean_err(a, b):
        return np.degrees(np.arccos(np.clip(np.abs(np.sum(a * b, axis=1)),
                                            0, 1))).mean()

    bias0 = mean_err(np.asarray(
        pc.smooth_normals_grid(pts, pts.copy(), radius=0.3, order=0)), v)
    bias1 = mean_err(np.asarray(
        pc.smooth_normals_grid(pts, pts.copy(), radius=0.3, order=1)), v)
    assert bias1 < 0.6 * bias0, (bias0, bias1)

    noisy = v + rng.normal(scale=0.25, size=v.shape)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    noisy = noisy.astype(np.float32)
    sm1 = np.asarray(pc.smooth_normals_grid(pts, noisy, radius=0.3, order=1))
    assert mean_err(sm1, v) < 0.6 * mean_err(noisy, v)
    np.testing.assert_allclose(np.linalg.norm(sm1, axis=1), 1.0, atol=1e-4)
    assert (np.sum(sm1 * v, axis=1) > 0).mean() > 0.99
