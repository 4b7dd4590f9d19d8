"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import numpy as np
import jax
from jax.sharding import Mesh

import objective_slam_tpu as ost
from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.parallel.sharded_match import make_sharded_matcher
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
