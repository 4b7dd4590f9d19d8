"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import numpy as np
import jax
from jax.sharding import Mesh

import objective_slam_tpu as ost
from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import drost
from objective_slam_tpu.parallel.sharded_match import (make_sharded_matcher,
                                                       size_sharded_caps)
from objective_slam_tpu.utils import synthetic, validation


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("ref",))


def test_sharded_match_recovers_pose(rng):
    cfg = PPFConfig(max_poses=256)
    mp, mn = synthetic.blob_cloud(rng, 100)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    matcher = make_sharded_matcher(_mesh(8), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=1 << 18)
    res = matcher(sp, sn)
    assert not bool(res.overflowed)
    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 desc.diameter, cfg)
    assert v.match, (v.trans_err, math.degrees(v.rot_err))


def test_sharded_matches_single_chip(rng):
    """The sharded path must agree with the single-chip path: same total
    votes and an equivalent winning pose."""
    cfg = PPFConfig(max_poses=256)
    mp, mn = synthetic.blob_cloud(rng, 90)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)

    single = ost.match(desc, sp, sn, cfg)
    matcher = make_sharded_matcher(_mesh(4), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=1 << 18)
    multi = matcher(sp, sn)
    assert int(single.num_votes) == int(multi.num_votes)
    td, rd = (float(x) for x in
              ost.ops.transforms.ht_dist(np.asarray(single.pose),
                                         np.asarray(multi.pose)))
    # Winners may differ among equivalent-vote cells; both must be valid.
    for pose in (single.pose, multi.pose):
        v = validation.validate_pose(np.asarray(pose), T_true,
                                     desc.diameter, cfg)
        assert v.match


def test_sharded_ref_padding(rng):
    """R not divisible by the mesh size: padded rows must contribute zero
    votes."""
    cfg = PPFConfig(max_poses=128, ref_point_df=3)
    mp, mn = synthetic.blob_cloud(rng, 60)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)   # 60 pts, R=20
    desc = ost.build_model_description(mp, mn, cfg)
    single = ost.match(desc, sp, sn, cfg)
    matcher = make_sharded_matcher(_mesh(8), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=1 << 16)
    multi = matcher(sp, sn)   # R_pad = 24, 4 padded rows
    assert int(single.num_votes) == int(multi.num_votes)


def test_sharded_full_featured_matches_single(rng):
    """Feature-complete sharded path (exact count-pass caps, ICP,
    rescoring) at few-thousand-point scale must agree with the single-chip
    `_match_core` to fp32 tolerance: identical vote totals AND the same
    ICP-refined winning pose (the survivor sets coincide whenever each
    shard's survivors fit in max_poses, so clustering/rescoring/ICP see
    identical inputs)."""
    cfg = PPFConfig(max_poses=256, ref_point_df=3, refine_icp=True,
                    icp_iterations=6, rescore_poses=True)
    mp, mn = synthetic.blob_cloud(rng, 150)
    cp, cn = synthetic.clutter_cloud(rng, 1200)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn, cp, cn)
    assert len(sp) >= 1300
    desc = ost.build_model_description(mp, mn, cfg)

    single = ost.match(desc, sp, sn, cfg)
    vc, sc = size_sharded_caps(desc, sp, sn, cfg, 8)
    matcher = make_sharded_matcher(_mesh(8), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=vc,
                                   seg_cap_per_shard=sc)
    multi = matcher(sp, sn)
    assert int(single.num_votes) == int(multi.num_votes)
    assert not bool(multi.overflowed)
    assert not bool(multi.topk_saturated)
    td, rd = (float(x) for x in
              ost.ops.transforms.ht_dist(np.asarray(single.pose),
                                         np.asarray(multi.pose)))
    assert td < 1e-3 * desc.diameter and rd < 1e-3, (td, rd)
    v = validation.validate_pose(np.asarray(multi.pose), T_true,
                                 desc.diameter, cfg)
    assert v.match, (v.trans_err, math.degrees(v.rot_err))


def test_sharded_fnv_mode(rng):
    """The operational FNV keying mode rides drost._scene_keys inside the
    shard — vote totals must match the single-chip FNV run exactly."""
    cfg = PPFConfig(max_poses=256, use_fnv_keys=True)
    mp, mn = synthetic.blob_cloud(rng, 90)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    single = ost.match(desc, sp, sn, cfg)
    vc, sc = size_sharded_caps(desc, sp, sn, cfg, 4)
    matcher = make_sharded_matcher(_mesh(4), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=vc,
                                   seg_cap_per_shard=sc)
    multi = matcher(sp, sn)
    assert int(single.num_votes) == int(multi.num_votes)
    v = validation.validate_pose(np.asarray(multi.pose), T_true,
                                 desc.diameter, cfg)
    assert v.match


def test_sharded_extract_instances(rng):
    """drost.extract_instances consumes a ShardedMatchResult unchanged
    (poses / pose_keep / clustered_counts surface parity)."""
    cfg = PPFConfig(max_poses=512, cluster_center_cell=True)
    mp, mn = synthetic.blob_cloud(rng, 100)
    cp, cn = synthetic.clutter_cloud(rng, 300)
    sp, sn, T1 = synthetic.plant_model(rng, mp, mn, cp, cn)
    diam = float(np.linalg.norm(mp.max(0) - mp.min(0)))
    sp, sn, T2 = synthetic.plant_model(
        rng, mp, mn, sp, sn,
        translation=T1[:3, 3] + np.float32(2.5) * diam)
    desc = ost.build_model_description(mp, mn, cfg)
    vc, sc = size_sharded_caps(desc, sp, sn, cfg, 4)
    matcher = make_sharded_matcher(_mesh(4), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=vc,
                                   seg_cap_per_shard=sc)
    res = matcher(sp, sn)
    poses, counts = drost.extract_instances(res, desc.diameter,
                                            max_instances=4)
    assert len(poses) >= 2
    found = []
    for T_true in (T1, T2):
        ok = any(validation.validate_pose(p, T_true, desc.diameter,
                                          cfg).match for p in poses)
        found.append(ok)
    assert all(found), (len(poses), found)


def test_sharded_correlation_engine(rng):
    """Multi-chip matching with the correlation engine."""
    cfg = PPFConfig(max_poses=256, engine="correlation")
    mp, mn = synthetic.blob_cloud(rng, 90)
    sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
    desc = ost.build_model_description(mp, mn, cfg)
    matcher = make_sharded_matcher(_mesh(4), desc, cfg, n_scene=len(sp),
                                   vote_cap_per_shard=1 << 16)
    res = matcher(sp, sn)
    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 desc.diameter, cfg)
    assert v.match, (v.trans_err, math.degrees(v.rot_err))
