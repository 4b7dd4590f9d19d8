"""Recognition-rate study: engine equivalence at dataset scale.

The benchmark's headline rides the correlation engine (voting_corr.py),
whose α binning is a documented ±1-bin approximation of the exact engines
(PARITY.md §10). This harness legitimizes that: it measures match rate and
pose error for the three engines — block/fast (exact), reference (exact,
readable), correlation (approximate) — over a grid of

    seeds × noise levels × occlusion levels  (+ distractor objects),

the rebuild's equivalent of the reference's UWA error-vs-occlusion analysis
(pcl/alignment/analyze_mian.py:75-195), on synthetic scenes with exact
ground truth. Writes eval_results.json and prints a summary table.

Usage:
  python tools/eval_recognition.py [--seeds N] [--quick] [--out PATH]

--quick: small clouds / few seeds (CI smoke; CPU-friendly).
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_trial(rng, mp_raw, mn_raw, *, n_total, occlusion, noise_rel,
                leaf, n_distractor=2):
    """One scene: planar clutter + distractor blobs + a (possibly occluded)
    planted model instance, with Gaussian point noise. Returns
    (scene_pts, scene_nrm, T_true)."""
    from objective_slam_tpu.utils import synthetic

    # Occlusion: half-space cut through the model centroid along a random
    # direction removing `occlusion` of its points (the planted instance is
    # partial; the model description stays complete).
    keep = np.ones(len(mp_raw), bool)
    if occlusion > 0:
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        proj = (mp_raw - mp_raw.mean(axis=0)) @ d
        keep = proj <= np.quantile(proj, 1.0 - occlusion)
    mp_cut, mn_cut = mp_raw[keep], mn_raw[keep]

    # Distractors: blobs with different bump statistics, placed away.
    parts_p, parts_n = [], []
    for b in range(n_distractor):
        dp, dn = synthetic.blob_cloud(rng, 2000, bumps=0.15 + 0.2 * b)
        q = synthetic.random_rotation_quat(rng)
        R = synthetic.quat_to_matrix(q)
        off = rng.uniform(-3.0, 5.0, size=3)
        parts_p.append(dp * (0.8 + 0.4 * b) @ R.T + off)
        parts_n.append(dn @ R.T)

    # Planar clutter fills the remaining budget.
    n_clutter = n_total - len(mp_cut) - sum(len(p) for p in parts_p)
    per = max(n_clutter // 6, 1)
    for b in range(6):
        cnt = per if b < 5 else n_clutter - 5 * per
        u = rng.uniform(-1.5, 1.5, size=(cnt, 2))
        z = rng.normal(scale=0.01, size=(cnt, 1))
        pts = np.concatenate([u, z], axis=1)
        q = synthetic.random_rotation_quat(rng)
        R = synthetic.quat_to_matrix(q)
        off = rng.uniform(-3.0, 5.0, size=3)
        parts_p.append(pts @ R.T + off)
        nrm = np.tile(R[:, 2], (cnt, 1))
        parts_n.append(nrm)

    cp = np.concatenate(parts_p).astype(np.float32)
    cn = np.concatenate(parts_n).astype(np.float32)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    scene, scene_n, T_true = synthetic.plant_model(rng, mp_cut, mn_cut,
                                                   cp, cn)
    if noise_rel > 0:
        sigma = noise_rel * leaf
        scene = scene + rng.normal(scale=sigma,
                                   size=scene.shape).astype(np.float32)
        scene_n = scene_n + rng.normal(
            scale=noise_rel * 0.5, size=scene_n.shape).astype(np.float32)
        scene_n /= np.linalg.norm(scene_n, axis=1, keepdims=True)
    return scene, scene_n, T_true


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", type=str, default="eval_results.json")
    ap.add_argument("--noises", type=str, default=None,
                    help="CSV noise levels (in units of leaf) — focused "
                         "re-runs of specific grid rows; seeds stay "
                         "identical to the full sweep's")
    ap.add_argument("--occs", type=str, default=None,
                    help="CSV occlusion fractions (same purpose)")
    ap.add_argument("--engines", type=str, default=None,
                    help="CSV engine subset (e.g. 'fast,fast+smooth') for "
                         "focused re-runs; seeds/scenes stay identical to "
                         "the full sweep's. The fast-vs-correlation "
                         "agreement row is only emitted when both run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models import drost
    from objective_slam_tpu.ops import transforms as tr
    from objective_slam_tpu.utils import pointcloud as pc, synthetic

    t0 = time.time()
    if args.quick:
        n_model_raw, n_total, seeds = 2500, 8000, min(args.seeds, 4)
        noises = [0.0, 0.5]
        occs = [0.0, 0.3]
    else:
        n_model_raw, n_total, seeds = 6000, 30000, args.seeds
        noises = [0.0, 0.25, 0.5]
        occs = [0.0, 0.3, 0.5]
    if args.noises is not None:
        noises = [float(x) for x in args.noises.split(",")]
    if args.occs is not None:
        occs = [float(x) for x in args.occs.split(",")]

    rng0 = np.random.default_rng(12345)
    mp_raw, mn_raw = synthetic.blob_cloud(rng0, n_model_raw)

    cfg0 = PPFConfig(max_poses=512, ref_point_df=5, engine="correlation")
    d_dist = cfg0.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg0, d_dist=d_dist)
    leaf = d_dist

    # "fast+smooth" = exact engine on a scene whose noisy normal field
    # was box-averaged on device first (pc.smooth_normals_grid). Measured
    # effect at sigma = 0.5·leaf (EVAL.md): key agreement with the clean
    # scene improves ~5x, but the window adds a coherent ~5 deg orientation
    # bias, so WITHOUT refinement the Hough pose slides past the 12 deg
    # budget more often than raw noise does. "+icp" variants measure the
    # production configuration (every CLI/bench path refines with ICP
    # against the raw scan), where that marginal-rotation failure mode is
    # pulled back inside the budget.
    # "+smooth1" = the order-1 (linear MLS) smoother, which cancels the
    # box window's first-order curvature bias (see the same EVAL section).
    engines = ["fast", "reference", "correlation", "fast+rescore",
               "fast+smooth", "fast+smooth1", "fast+icp", "fast+smooth+icp",
               "fast+smooth1+icp"]
    if args.engines is not None:
        engines = [e for e in engines if e in args.engines.split(",")]
    cfgs = {e: PPFConfig(max_poses=512, ref_point_df=5,
                         engine=e.split("+")[0],
                         rescore_poses="+rescore" in e,
                         refine_icp="+icp" in e)
            for e in engines}

    # Static VOXEL capacity from probed occupancy at the noisiest corner:
    # point noise inflates the occupied-cell count (~1900 voxels clean ->
    # ~4000 at sigma = 0.5·leaf for the 30k scene). The fixed 2048 used
    # before round 3's audit silently merged every voxel past capacity
    # into one garbage cell (voxel_downsample clips; `dropped` was never
    # checked) — the "noise cliff" in the round-2 table was largely THAT
    # truncation, not noise physics. Capacity is now sized from the probe
    # (pad 15%, lane-rounded) and `dropped` fails the run loudly.
    occ_probe = []
    for s in range(2):
        for noise_probe in (0.0, max(noises)):
            rng = np.random.default_rng(1000 + s)
            sp, sn, _ = build_trial(rng, mp_raw, mn_raw, n_total=n_total,
                                    occlusion=0.0, noise_rel=noise_probe,
                                    leaf=leaf)
            occ_probe.append(
                int(pc.voxel_downsample_np(sp, sn, leaf)[0].shape[0]))
    vox_capacity = ((int(max(occ_probe) * 1.15) + 127) // 128) * 128
    print(f"[eval] voxel occupancies {occ_probe} -> capacity {vox_capacity}",
          file=sys.stderr, flush=True)

    # Static vote capacity: probe the vote-heaviest corners (occlusion 0 =
    # full model instance; both noise extremes — noise spreads scene keys
    # across more buckets and can RAISE the match count), take the max,
    # pad 2x. Probing only the occluded/noiseless corner undersized the
    # cap and overflowed 15 exact-engine runs in an earlier sweep.
    probe_caps = []
    for s in range(2):
        for noise_probe in (0.0, max(noises)):
            rng = np.random.default_rng(1000 + s)
            sp, sn, _ = build_trial(rng, mp_raw, mn_raw, n_total=n_total,
                                    occlusion=0.0, noise_rel=noise_probe,
                                    leaf=leaf)
            vox = pc.voxel_downsample(sp, sn, leaf, capacity=vox_capacity)
            assert not bool(vox.dropped)
            tot, rows, _ = drost._count_votes(desc, vox.points, vox.normals,
                                              cfg0.ref_point_df,
                                              cfg0.d_angle)
            probe_caps.append((tot, rows))
    n_ref = (vox_capacity + cfg0.ref_point_df - 1) // cfg0.ref_point_df
    from objective_slam_tpu.ops import voting_block
    cap_block = drost._next_cap(
        2 * max(r for _, r in probe_caps) * 128
        + voting_block.CHUNK_ROWS * n_ref * 128)
    cap_ref = drost._next_cap(2 * max(t for t, _ in probe_caps))
    caps = {e: {"fast": cap_block, "reference": cap_ref,
                "correlation": 0}[e.split("+")[0]] for e in engines}
    print(f"[eval] caps: block {cap_block}, reference {cap_ref}",
          file=sys.stderr, flush=True)

    results = []
    budget = math.radians(cfg0.validation_rotation_threshold_deg)
    for noise in noises:
        for occ in occs:
            for s in range(seeds):
                rng = np.random.default_rng(
                    hash((int(noise * 100), int(occ * 100), s)) % 2**31)
                sp, sn, T_true = build_trial(
                    rng, mp_raw, mn_raw, n_total=n_total, occlusion=occ,
                    noise_rel=noise, leaf=leaf)
                vox = pc.voxel_downsample(sp, sn, leaf,
                                          capacity=vox_capacity)
                assert not bool(vox.dropped), (noise, occ, s)
                # Lazy per-scene smoothing variants (order 0 = box mean,
                # order 1 = bias-cancelling linear MLS fit), built only
                # when a requesting engine runs.
                smoothed = {}

                def smooth_variant(order):
                    if order not in smoothed:
                        nrm = np.asarray(pc.smooth_normals_grid(
                            sp, sn, leaf, order=order))
                        smoothed[order] = (nrm, pc.voxel_downsample(
                            sp, nrm, leaf, capacity=vox_capacity))
                    return smoothed[order]

                poses = {}
                for e in engines:
                    if "+smooth1" in e:
                        sn_e, vox_e = smooth_variant(1)
                    elif "+smooth" in e:
                        sn_e, vox_e = smooth_variant(0)
                    else:
                        sn_e, vox_e = sn, vox
                    if cfgs[e].refine_icp:
                        # ICP refines against the (subsampled) raw scan —
                        # the production configuration (cli.py, bench.py);
                        # the voxelized cloud alone stalls ICP at the
                        # sampling-spacing floor.
                        icp_p = sp[::4]
                        icp_n = sn_e[::4]
                    else:
                        icp_p = icp_n = None
                    res = drost._match_jit(desc, vox_e.points,
                                           vox_e.normals,
                                           cfgs[e].ref_point_df, caps[e],
                                           cfgs[e], icp_points=icp_p,
                                           icp_normals=icp_n)
                    pose = np.asarray(res.pose)
                    td, rd = (float(x) for x in tr.ht_dist(pose, T_true))
                    poses[e] = pose
                    results.append({
                        "noise": noise, "occ": occ, "seed": s, "engine": e,
                        "trans_err": td, "rot_err_deg": math.degrees(rd),
                        "match": bool(td < 0.1 * desc.diameter
                                      and rd < budget),
                        "overflowed": bool(res.overflowed),
                    })
                # winner agreement fast vs correlation
                if not {"fast", "correlation"} <= set(engines):
                    continue
                tdx, rdx = (float(x) for x in tr.ht_dist(
                    poses["fast"], poses["correlation"]))
                results.append({
                    "noise": noise, "occ": occ, "seed": s,
                    "engine": "agree_fast_corr",
                    "trans_err": tdx, "rot_err_deg": math.degrees(rdx),
                    "match": bool(tdx < 0.1 * desc.diameter
                                  and rdx < budget),
                    "overflowed": False,
                })
            done = sum(1 for r in results if r["engine"] == "fast")
            print(f"[eval] noise={noise} occ={occ} done "
                  f"({time.time()-t0:.0f}s, {done} trials)",
                  file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump({"model_points": int(desc.n_points),
                   "diameter": desc.diameter, "seeds": seeds,
                   "n_total": n_total, "results": results}, f)

    # Summary table (the agreement column only exists when both fast and
    # correlation ran — focused subsets skip it).
    cols = engines + (["agree_fast_corr"]
                      if {"fast", "correlation"} <= set(engines) else [])
    print(f"{'noise':>6} {'occ':>5} | " + " | ".join(
        f"{e:>12}" for e in cols))
    for noise in noises:
        for occ in occs:
            row = []
            for e in cols:
                sel = [r for r in results
                       if r["engine"] == e and r["noise"] == noise
                       and r["occ"] == occ]
                rate = sum(r["match"] for r in sel) / max(len(sel), 1)
                rerr = float(np.median([r["rot_err_deg"] for r in sel]))
                row.append(f"{rate*100:5.1f}% {rerr:4.1f}d")
            print(f"{noise:>6} {occ:>5} | " + " | ".join(
                f"{c:>12}" for c in row))
    ovf = sum(r["overflowed"] for r in results)
    print(f"overflows: {ovf}")


if __name__ == "__main__":
    main()
