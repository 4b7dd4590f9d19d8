"""TSDF fusion + streaming recognition tests (BASELINE config 5)."""

import math

import numpy as np
import jax.numpy as jnp

import objective_slam_tpu as ost
from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import tsdf
from objective_slam_tpu.ops import transforms as tr
from objective_slam_tpu.utils import synthetic, validation


def _sphere_cloud(rng, n, center, radius):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (center + radius * v).astype(np.float32), v.astype(np.float32)


def test_integrate_and_extract_sphere(rng):
    vol = tsdf.make_volume(origin=(-1.5, -1.5, -1.5), dims=(48, 48, 48),
                           voxel_size=1 / 16)
    pts, nrm = _sphere_cloud(rng, 4000, np.zeros(3), 1.0)
    vol = tsdf.integrate(vol, pts, nrm)
    surf = tsdf.extract_surface(vol, capacity=2048)
    assert int(surf.count) > 500
    sp = np.asarray(surf.points)[np.asarray(surf.valid)]
    radii = np.linalg.norm(sp, axis=1)
    # Surface voxels hug the unit sphere within ~a voxel.
    assert abs(np.median(radii) - 1.0) < 0.1
    # Gradient normals point radially (outward = +tsdf direction).
    sn = np.asarray(surf.normals)[np.asarray(surf.valid)]
    cos = np.abs(np.sum(sn * sp / radii[:, None], axis=1))
    assert np.median(cos) > 0.9


def test_weighted_average_multiframe(rng):
    """Two identical frames must not change the fused tsdf (running
    average), and weights must add."""
    vol = tsdf.make_volume(origin=(-1.5, -1.5, -1.5), dims=(32, 32, 32),
                           voxel_size=0.1)
    pts, nrm = _sphere_cloud(rng, 1000, np.zeros(3), 1.0)
    v1 = tsdf.integrate(vol, pts, nrm)
    v2 = tsdf.integrate(v1, pts, nrm)
    m = np.asarray(v1.weight) > 0
    np.testing.assert_allclose(np.asarray(v2.tsdf)[m],
                               np.asarray(v1.tsdf)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2.weight)[m],
                               2 * np.asarray(v1.weight)[m], atol=1e-4)


def test_streaming_recognition(rng):
    """Fuse partial views of a scene containing a known model, then
    recognize the model's pose from the fused surface."""
    cfg = PPFConfig(max_poses=512, ref_point_df=2)
    mp, mn = synthetic.blob_cloud(rng, 1500, bumps=0.5)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)

    vol = tsdf.make_volume(origin=sp.min(axis=0) - 0.3,
                           dims=(40, 40, 40), voxel_size=0.1)
    rec = tsdf.StreamingRecognizer(vol, cfg, surface_capacity=896)

    # Build the model description through the SAME sensing pipeline (fuse
    # the model into its own volume, extract its surface) so both sides
    # share sampling density and normal convention.
    mvol = tsdf.make_volume(origin=mp.min(axis=0) - 0.3,
                            dims=(40, 40, 40), voxel_size=0.1)
    mvol = tsdf.integrate(mvol, mp, mn)
    msurf = tsdf.extract_surface(mvol, capacity=352)
    mpts = np.asarray(msurf.points)[np.asarray(msurf.valid)]
    mnrm = np.asarray(msurf.normals)[np.asarray(msurf.valid)]
    rec.register_model("blob", ost.build_model_description(mpts, mnrm, cfg))

    # Stream the scene in 3 chunks (partial "frames").
    order = rng.permutation(len(sp))
    for part in np.array_split(order, 3):
        rec.integrate_frame(sp[part], sn[part])
    assert rec.frames == 3

    res = rec.recognize()["blob"]
    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 rec.models["blob"].diameter, cfg)
    # Fused-surface quantization costs accuracy; require the match criteria.
    assert v.match, (v.trans_err, math.degrees(v.rot_err))
