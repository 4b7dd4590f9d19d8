"""Tests for ICP refinement and model-description serialization."""

import math

import numpy as np
import jax
import jax.numpy as jnp

import objective_slam_tpu as ost
from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.ops import icp, transforms as tr
from objective_slam_tpu.utils import serialization, synthetic, validation


def test_icp_refines_perturbed_pose(rng):
    mp, mn = synthetic.blob_cloud(rng, 200)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    # Perturb truth by ~6 deg + small translation (a typical Drost winner).
    pert = np.asarray(tr.rotx(math.radians(6.0)))
    T0 = T_true @ pert
    T0[:3, 3] += rng.normal(scale=0.02, size=3)
    res = icp.refine_pose(mp, sp, T0, max_dist=0.3)
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(res.pose), T_true))
    assert td < 1e-3, td
    assert math.degrees(rd) < 0.5, math.degrees(rd)
    assert float(res.rms) < 1e-3
    assert int(res.inliers) > 150


def test_icp_after_drost_match(rng):
    """Full pipeline: Drost match then ICP — rotation error drops well
    below the α-quantization bound."""
    cfg = PPFConfig(max_poses=256)
    mp, mn = synthetic.blob_cloud(rng, 120)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    res = ost.match(desc, sp, sn, cfg)
    coarse_td, coarse_rd = (float(x) for x in
                            tr.ht_dist(np.asarray(res.pose), T_true))
    refined = icp.refine_pose(mp, sp, res.pose,
                              max_dist=2.0 * float(desc.d_dist))
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(refined.pose), T_true))
    assert td < 1e-3, (coarse_td, td)
    assert rd < coarse_rd + 1e-6
    assert math.degrees(rd) < 0.5, (math.degrees(coarse_rd),
                                    math.degrees(rd))


def test_icp_respects_scene_valid_mask(rng):
    mp, mn = synthetic.blob_cloud(rng, 100)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    # Append garbage padding rows that must be ignored.
    pad = np.full((50, 3), 1e6, np.float32)
    sp_pad = np.concatenate([sp, pad])
    valid = np.concatenate([np.ones(len(sp), bool), np.zeros(50, bool)])
    T0 = np.array(T_true)
    T0[:3, 3] += 0.02
    res = icp.refine_pose(mp, sp_pad, T0, max_dist=0.3, scene_valid=valid)
    td, _ = (float(x) for x in tr.ht_dist(np.asarray(res.pose), T_true))
    assert td < 1e-3


def test_icp_jits(rng):
    mp, mn = synthetic.blob_cloud(rng, 64)
    sp, _, T_true = synthetic.plant_model(rng, mp, mn)
    f = jax.jit(lambda m, s, t: icp.refine_pose(m, s, t, max_dist=0.5).pose)
    out = f(mp, sp, jnp.asarray(T_true))
    assert out.shape == (4, 4)


def test_icp_point_to_plane_converges(rng):
    """Hybrid Kabsch -> clamped point-to-plane from a ~6 deg perturbation:
    must converge, not diverge (undamped Gauss-Newton on point-to-plane
    overshoots ~18 deg on the first step with inconsistent correspondences)."""
    mp_raw, mn_raw = synthetic.blob_cloud(rng, 4000)
    from objective_slam_tpu.utils import pointcloud as pc
    d_dist = 0.1 * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    sp, sn, T_true = synthetic.plant_model(rng, mp_raw, mn_raw)
    pert = np.asarray(tr.rotx(math.radians(6.0)))
    T0 = T_true @ pert
    T0[:3, 3] += rng.normal(scale=0.02, size=3)
    res = icp.refine_pose(mp, sp, T0, iterations=16, max_dist=2.0 * d_dist,
                          scene_normals=sn, model_normals=mn)
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(res.pose), T_true))
    assert math.degrees(rd) < 2.0, math.degrees(rd)
    assert td < 0.05 * 2.0, td


def test_icp_raw_scan_beats_voxel_floor(rng):
    """match(icp_points=<raw scan>): with BOTH clouds voxelized at d_dist,
    point-to-point ICP stalls at the sampling-spacing floor; refining
    against the raw scan must do strictly better (VERDICT r1 next #4)."""
    from objective_slam_tpu.utils import pointcloud as pc
    mp_raw, mn_raw = synthetic.blob_cloud(rng, 4000)
    sp_raw, sn_raw, T_true = synthetic.plant_model(rng, mp_raw, mn_raw)
    cfg = PPFConfig(ref_point_df=2, refine_icp=True)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    spd, snd = pc.voxel_downsample_np(sp_raw, sn_raw, d_dist)
    res_vox = ost.match(desc, spd, snd, cfg)
    res_raw = ost.match(desc, spd, snd, cfg, icp_points=sp_raw,
                        icp_normals=sn_raw)
    _, rd_vox = (float(x) for x in tr.ht_dist(np.asarray(res_vox.pose),
                                              T_true))
    td, rd_raw = (float(x) for x in tr.ht_dist(np.asarray(res_raw.pose),
                                               T_true))
    assert rd_raw < rd_vox + 1e-6, (rd_vox, rd_raw)
    assert math.degrees(rd_raw) < 2.0, math.degrees(rd_raw)
    assert td < 0.02 * desc.diameter, (td, desc.diameter)


def test_model_description_roundtrip(tmp_path, rng):
    """Serialize + reload a description; matching results are identical —
    the checkpoint/resume path the reference lacks (SURVEY.md §5)."""
    cfg = PPFConfig(max_poses=128)
    mp, mn = synthetic.blob_cloud(rng, 80)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    path = tmp_path / "model.osn.npz"
    serialization.save_model_description(path, desc)
    desc2 = serialization.load_model_description(path)
    assert desc2.n_points == desc.n_points
    assert desc2.diameter == desc.diameter
    r1 = ost.match(desc, sp, sn, cfg)
    r2 = ost.match(desc2, sp, sn, cfg)
    np.testing.assert_array_equal(np.asarray(r1.accumulator),
                                  np.asarray(r2.accumulator))
    np.testing.assert_allclose(np.asarray(r1.pose), np.asarray(r2.pose),
                               atol=0)


def test_correlation_roundtrip(tmp_path, rng):
    """A saved-then-loaded model built for the correlation engine must run
    that engine (ADVICE r1: corr_tables were dropped on load, silently
    yielding an all-zero accumulator)."""
    import pytest

    cfg = PPFConfig(max_poses=128, engine="correlation")
    mp, mn = synthetic.blob_cloud(rng, 80)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    assert desc.corr_tables is not None
    path = tmp_path / "model_corr.osn.npz"
    serialization.save_model_description(path, desc)
    desc2 = serialization.load_model_description(path)
    assert desc2.corr_tables is not None
    r1 = ost.match(desc, sp, sn, cfg)
    r2 = ost.match(desc2, sp, sn, cfg)
    np.testing.assert_array_equal(np.asarray(r1.accumulator),
                                  np.asarray(r2.accumulator))
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(r2.pose), T_true))
    assert td < 0.1 * desc.diameter
    assert rd < math.radians(12)
    # A model built WITHOUT corr tables must refuse the correlation engine
    # rather than silently degrade.
    desc_fast = ost.build_model_description(
        mp, mn, PPFConfig(max_poses=128, engine="fast"))
    with pytest.raises(ValueError, match="corr_tables"):
        ost.match(desc_fast, sp, sn, cfg)


def test_point_to_plane_without_normals_raises(rng):
    """Requesting the point-to-plane solver without scene normals for the
    ICP cloud must fail loudly at the API boundary (used to trace into a
    NameError deep inside the plane solve)."""
    import pytest

    mp, mn = synthetic.blob_cloud(rng, 50)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    with pytest.raises(ValueError, match="point-to-plane"):
        icp.refine_pose(mp, sp, np.eye(4, dtype=np.float32),
                        max_dist=0.3, point_to_plane=True)
