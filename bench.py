"""Benchmark: PPF voting throughput + end-to-end pose recovery latency.

Prints ONE JSON line:
  {"metric": ..., "value": <votes/sec/chip>, "unit": "votes/s",
   "vs_baseline": <value / 1e9>, "extra": {...}}

Scenario (BASELINE.md): a 100k-point raw scene containing a planted model
instance plus clutter; the timed pipeline is voxel-grid downsample (on
device) -> pairwise PPF keys/α -> Hough voting -> pose extraction +
clustering. Baseline targets: ≥1e9 votes/sec/chip and <30 ms end-to-end
pose on TPU v5e-1.
"""

import json
import math
import time

import numpy as np


def main():
    import jax
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models import drost
    from objective_slam_tpu.utils import pointcloud as pc, synthetic, validation

    rng = np.random.default_rng(0)

    # --- build the 100k-point scene -------------------------------------
    n_model_raw = 20_000
    mp_raw, mn_raw = synthetic.blob_cloud(rng, n_model_raw)
    cp, cn = synthetic.clutter_cloud(rng, 80_000, lo=-4.0, hi=6.0)
    scene_raw, scene_nrm_raw, T_true = synthetic.plant_model(
        rng, mp_raw, mn_raw, cp, cn)
    assert scene_raw.shape[0] == 100_000

    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    # Model: voxel-downsampled to d_dist resolution (reference protocol,
    # alignment.cpp:277-288).
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)

    # Scene leaf: targets a few thousand scene points.
    scene_leaf = 0.12
    vox_capacity = 8192

    import jax.numpy as jnp
    from objective_slam_tpu.models.drost import _match_core

    vote_cap = None

    def pipeline(raw_p, raw_n, cap):
        vox = pc.voxel_downsample(raw_p, raw_n, scene_leaf,
                                  capacity=vox_capacity)
        res = _match_core(desc, vox.points, vox.normals,
                          ref_point_df=cfg.ref_point_df, vote_cap=cap,
                          config=cfg)
        return res

    # Size the vote buffer once (static thereafter).
    probe = jax.jit(lambda p, n: pipeline(p, n, 1 << 20))(
        scene_raw, scene_nrm_raw)
    total = int(probe.num_votes)
    cap = 1 << max(16, int(math.ceil(math.log2(max(total, 1) * 1.1))))

    run = jax.jit(lambda p, n: pipeline(p, n, cap))
    # Voting-only stage for the votes/sec metric.
    def voting_stage(raw_p, raw_n):
        vox = pc.voxel_downsample(raw_p, raw_n, scene_leaf,
                                  capacity=vox_capacity)
        from objective_slam_tpu.ops import ppf as ppf_ops, voting
        ref_idx = jnp.arange(0, vox_capacity, cfg.ref_point_df,
                             dtype=jnp.int32)
        keys, alpha = ppf_ops.pairwise_ppf_keys(
            vox.points, vox.normals, desc.d_dist, cfg.d_angle,
            desc.max_dist_bin, ref_indices=ref_idx)
        return voting.cast_votes(keys, alpha, desc.table, desc.n_points,
                                 cfg.d_angle, cap)

    vrun = jax.jit(voting_stage)

    # --- warmup + timing -------------------------------------------------
    sp_dev = jax.device_put(scene_raw)
    sn_dev = jax.device_put(scene_nrm_raw)
    res = run(sp_dev, sn_dev)
    jax.block_until_ready(res.pose)
    vres = vrun(sp_dev, sn_dev)
    jax.block_until_ready(vres.accumulator)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run(sp_dev, sn_dev)
    jax.block_until_ready(res.pose)
    e2e_ms = (time.perf_counter() - t0) / reps * 1e3

    t0 = time.perf_counter()
    for _ in range(reps):
        vres = vrun(sp_dev, sn_dev)
    jax.block_until_ready(vres.accumulator)
    vote_s = (time.perf_counter() - t0) / reps
    n_votes = int(vres.num_votes)
    votes_per_s = n_votes / vote_s

    v = validation.validate_pose(np.asarray(res.pose), T_true,
                                 desc.diameter, cfg)

    print(json.dumps({
        "metric": "ppf_votes_per_sec_per_chip",
        "value": votes_per_s,
        "unit": "votes/s",
        "vs_baseline": votes_per_s / 1e9,
        "extra": {
            "e2e_pose_ms_100k_scene": e2e_ms,
            "e2e_target_ms": 30.0,
            "num_votes": n_votes,
            "voting_stage_ms": vote_s * 1e3,
            "model_points": int(desc.n_points),
            "scene_voxels_capacity": vox_capacity,
            "pose_match": bool(v.match),
            "trans_err": v.trans_err,
            "rot_err_deg": math.degrees(v.rot_err),
            "overflowed": bool(res.overflowed),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
