"""Benchmark: PPF voting throughput + end-to-end pose recovery latency.

Prints ONE JSON line:
  {"metric": ..., "value": <votes/sec/chip>, "unit": "votes/s",
   "vs_baseline": <value / 1e9>, "extra": {...}}

Scenario (BASELINE.md): a 100k-point raw scan of a tabletop-like scene —
one planted model instance among surface clutter — on TPU v5e-1. The timed
pipeline is fully on device: voxel-grid downsample -> pairwise PPF keys/α ->
Hough voting -> top-K -> pose reconstruction -> clustering -> ICP -> winner.
Baseline targets: ≥1e9 votes/sec/chip and <30 ms end-to-end pose.

Protocol: NSEEDS scenes (distinct layouts/poses, same model), identical
static shapes; timings are per-seed means over REPS runs with fresh jitter
per rep (the axon tunnel caches identical-input dispatches); accuracy is
reported per seed and must hold for all seeds.

Engines measured:
  exact  — engine="fast" (block-expansion, ops/voting_block.py): tallies
           bit-equal to the reference semantics (PARITY.md).
  corr   — engine="correlation" (matmul Hough, ops/voting_corr.py): ±1
           α-bin transport; recognition-equivalent (see EVAL.md).
The headline is the faster engine's votes/s; both appear in extra.
"""

import json
import math
import os
import sys
import time

import numpy as np

VERBOSE = os.environ.get("BENCH_VERBOSE", "0") == "1"
NSEEDS = int(os.environ.get("BENCH_SEEDS", "3"))
REPS = int(os.environ.get("BENCH_REPS", "24"))
_T0 = time.time()


def _log(msg):
    if VERBOSE:
        print(f"[bench {time.time()-_T0:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/objective_slam_tpu_xla_cache")


def _await_relay():
    """TPU-tunnel preflight: jax backend init blocks FOREVER at 0% CPU when
    the axon relay (127.0.0.1:8082) is down, and outages can last hours.
    Probe the port first; wait a bounded time (BENCH_RELAY_WAIT_S, default
    30 min) for it to return, then fail loudly with a non-zero exit so the
    caller sees an outage, not a hang. Skipped on explicit CPU runs."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return
    import socket

    def up():
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=2):
                return True
        except OSError:
            return False

    deadline = time.time() + float(os.environ.get("BENCH_RELAY_WAIT_S",
                                                  "1800"))
    waited = False
    while not up():
        if time.time() > deadline:
            print("bench: TPU relay 127.0.0.1:8082 unreachable for "
                  "BENCH_RELAY_WAIT_S — aborting instead of hanging in "
                  "jax init", file=sys.stderr, flush=True)
            sys.exit(2)
        if not waited:
            _log("TPU relay down; waiting for 127.0.0.1:8082 ...")
            waited = True
        time.sleep(20)


def build_model(rng, n_model_raw=20_000):
    from objective_slam_tpu.utils import synthetic
    return synthetic.blob_cloud(rng, n_model_raw)


N_INSTANCES = 4


def build_scene(rng, mp_raw, mn_raw, n_total=100_000,
                n_instances=N_INSTANCES):
    """A bin-picking-style scan: several instances of the model among
    planar clutter patches — the standard PPF benchmark setting (the
    reference's UWA scenes hold 4-5 objects each, analyze_mian.py).

    Clutter is surface-like (scans are surfaces) and geometrically
    DISSIMILAR to the model — blob clutter would share the model's local
    curvature statistics and inflate votes beyond any real scene. Multiple
    instances, by contrast, raise the vote count the way a real crowded
    bin does: every instance genuinely matches the model description.

    Returns (scene, normals, [T_true per instance])."""
    from objective_slam_tpu.utils import synthetic

    n_inst_pts = 15_000
    n_clutter = n_total - n_instances * n_inst_pts
    per = n_clutter // 8
    cps, cns = [], []
    for b in range(8):
        cnt = per if b < 7 else n_clutter - 7 * per
        u = rng.uniform(-1.5, 1.5, size=(cnt, 2))
        z = rng.normal(scale=0.01, size=(cnt, 1))
        pts = np.concatenate([u, z], axis=1)
        q = synthetic.random_rotation_quat(rng)
        R = synthetic.quat_to_matrix(q)
        offset = rng.uniform(-3.0, 5.0, size=3)
        cps.append(pts @ R.T + offset)
        nrm = np.tile(R[:, 2], (cnt, 1)) + rng.normal(scale=0.02,
                                                      size=(cnt, 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        cns.append(nrm)
    sp = np.concatenate(cps).astype(np.float32)
    sn = np.concatenate(cns).astype(np.float32)

    diam = float(np.linalg.norm(mp_raw.max(0) - mp_raw.min(0)))
    truths = []
    centers = []
    for _ in range(n_instances):
        sel = rng.choice(len(mp_raw), size=n_inst_pts, replace=False)
        # Spread instances at least a diameter apart so they don't merge.
        while True:
            t = rng.uniform(-2.5, 2.5, size=3).astype(np.float32)
            if all(np.linalg.norm(t - c) > diam for c in centers):
                break
        centers.append(t)
        sp, sn, T = synthetic.plant_model(rng, mp_raw[sel], mn_raw[sel],
                                          sp, sn, translation=t)
        truths.append(T)
    return sp, sn, truths


def tally_bitequal_check(keys, alpha, desc, d_angle, cap, seg_cap,
                         cap_fast, cap_ref_gate):
    """On-device tally cross-validation (util.hpp:55-91's golden-dump role).

    Two comparisons, different strengths by design:
      bitequal     — block engine (Pallas tally) vs fast engine (packed
                     lookup + segment fills): SAME vote set, SAME 22-bit
                     fixed-point α binning, disjoint tally code paths. Must
                     be exactly True; a row-map/routing bug in the Pallas
                     kernel (the round-3 class, commit 6d2fa95) trips it.
      ref_flip_votes — |block − readable float32 engine| summed / 2: the
                     engines bin α differently (fixed-point quantizes α_s
                     and α_m to 2^-22 BEFORE subtracting; the readable
                     engine subtracts float32 first), so a ~1e-5/vote
                     fraction of votes lands one α bin over at multi-
                     million-vote scale. Bounded, not zero — asserting
                     bit-equality here is WRONG (round-5 finding; the
                     round-4 gate would have failed on hardware even with
                     its arg order fixed). Caller checks rate < 1e-4.

    Module-level (not a bench-main closure) so the CPU-mesh suite traces
    the exact wiring the TPU gate runs (tests/test_tools.py) — the round-4
    arg-swap shipped unexecuted precisely because it lived inside main().

    Returns (bitequal, ref_votes_equal, ref_flip_votes, any_overflow)."""
    import jax.numpy as jnp
    from objective_slam_tpu.ops import voting as voting_ref
    from objective_slam_tpu.ops import voting_block, voting_fast

    blk = voting_block.cast_votes_block(
        keys, alpha, desc.fast_tables.block, desc.n_points,
        d_angle, cap, seg_cap=seg_cap)
    fst = voting_fast.cast_votes_fast(
        keys, alpha, desc.fast_tables, desc.n_points, d_angle, cap_fast)
    ref = voting_ref.cast_votes(keys, alpha, desc.table, desc.n_points,
                                d_angle, cap_ref_gate)
    bitequal = (jnp.all(blk.accumulator == fst.accumulator)
                & (blk.num_votes == fst.num_votes))
    # Each bin-flip moves one vote between adjacent cells: +1 and -1.
    ref_flip_votes = jnp.sum(
        jnp.abs(blk.accumulator - ref.accumulator)) // 2
    return (bitequal, blk.num_votes == ref.num_votes, ref_flip_votes,
            blk.overflowed | fst.overflowed | ref.overflowed)


def make_sized_runner(desc, cfg, vox_jit):
    """Production-configuration match: exact count pass + host sync per
    call (drost.match), voxelization through the ONE cached jit wrapper
    (a fresh jax.jit per rep would retrace the voxelizer every timed call
    and contaminate the latency — round-4 advisor finding). Module-level
    for the same testability reason as tally_bitequal_check."""
    from objective_slam_tpu.models import drost

    def run_sized(raw_p, raw_n):
        vox = vox_jit(raw_p, raw_n)
        return drost.match(desc, vox.points, vox.normals, cfg,
                           icp_points=raw_p[::8], icp_normals=raw_n[::8])
    return run_sized


def _time(fn, args_list, warm):
    """Mean wall time over fresh-input calls; blocks on every output."""
    import jax
    out = fn(*warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(args_list), outs[-1]


def main():
    _await_relay()
    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models.drost import _match_core, _count_votes
    from objective_slam_tpu.models import drost
    from objective_slam_tpu.ops import ppf as ppf_ops
    from objective_slam_tpu.ops import voting_block, voting_corr
    from objective_slam_tpu.utils import pointcloud as pc, validation

    rng0 = np.random.default_rng(0)
    mp_raw, mn_raw = build_model(rng0)
    scenes = []
    for s in range(NSEEDS):
        rng = np.random.default_rng(s)
        scenes.append(build_scene(rng, mp_raw, mn_raw))
    assert all(sp.shape[0] == 100_000 for sp, _, _ in scenes)

    def validate_best(pose, truths, diameter, cfg_v):
        """Winner must localize SOME planted instance (multi-instance
        scene; single-pose output explains the strongest peak)."""
        vs = [validation.validate_pose(pose, T, diameter, cfg_v)
              for T in truths]
        return min(vs, key=lambda v: v.rot_err + (0.0 if v.match else 1e3))

    # max_poses 512: enough candidate cells for the argmax pose and all 4
    # instances' peaks (instance recall 4/4 below). topk_saturated DOES
    # fire on these dense multi-instance scenes — the 0.4·max relative
    # threshold admits more cells than any practical budget; drost.match's
    # retry ladder runs to its 8192 ceiling still flagged (round-5
    # diagnosis, see EVAL.md multi-instance note) — which is why the timed
    # pipeline uses _match_core at a FIXED budget and the sized path's
    # latency includes the ladder. ICP at 20 iterations over the strided
    # scan sits at ~1.5 deg; both chosen inside the accuracy budget.
    cfg = PPFConfig(max_poses=512, ref_point_df=5, engine="fast",
                    refine_icp=True, icp_iterations=20)
    cfg_corr = PPFConfig(max_poses=512, ref_point_df=5,
                         engine="correlation", refine_icp=True,
                         icp_iterations=20)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    # engine="correlation" builds fast (incl. block) AND correlation tables.
    desc = ost.build_model_description(mp, mn, cfg_corr, d_dist=d_dist)
    assert desc.fast_tables.block is not None

    # Reference protocol: scene leaf comparable to the model's d_dist
    # (alignment.cpp uses scene_leaf_size 10 vs chef d_dist 13.6).
    scene_leaf = d_dist
    occ = [int(pc.voxel_downsample(sp, sn, scene_leaf,
                                   capacity=100_000).num_voxels)
           for sp, sn, _ in scenes]
    # Static capacity sized to the max occupancy (+2%, lane-aligned).
    vox_capacity = ((int(max(occ) * 1.02) + 127) // 128) * 128
    ref_idx = jnp.arange(0, vox_capacity, cfg.ref_point_df, dtype=jnp.int32)
    n_ref = ref_idx.shape[0]
    _log(f"occupancies {occ}; capacity {vox_capacity}")

    # Exact count pass per seed -> static caps over all seeds.
    totals, rowss, segss = [], [], []
    for sp, sn, _ in scenes:
        vox = pc.voxel_downsample(sp, sn, scene_leaf, capacity=vox_capacity)
        t, r, g = _count_votes(desc, vox.points, vox.normals,
                               cfg.ref_point_df, cfg.d_angle)
        totals.append(t)
        rowss.append(r)
        segss.append(g)
    cap = drost._next_cap(
        (max(rowss) + voting_block.CHUNK_ROWS * n_ref) * 128)
    seg_cap = drost._next_cap(max(max(segss), 1024))
    _log(f"votes {totals}; rows {rowss}; segs {segss}; cap {cap}")

    def vox_of(raw_p, raw_n):
        return pc.voxel_downsample(raw_p, raw_n, scene_leaf,
                                   capacity=vox_capacity)

    def pipeline(cfg_run):
        def run(raw_p, raw_n):
            vox = vox_of(raw_p, raw_n)
            # ICP refines against the RAW scan (icp_points): with both
            # clouds voxelized at d_dist, point-to-point ICP stalls at the
            # sampling-spacing floor (~10 deg here) instead of converging.
            # An 8x stride of the raw scan keeps it well above the voxel
            # floor (12.5k points ≈ 7x the voxel density) at ~1/8 the NN
            # cost — measured as accurate as the full scan (1.73 vs 2.12
            # deg at 20 iterations; less clutter in the rejection radius).
            return _match_core(desc, vox.points, vox.normals,
                               ref_point_df=cfg_run.ref_point_df,
                               vote_cap=cap if cfg_run.engine == "fast"
                               else 0,
                               config=cfg_run, icp_points=raw_p[::8],
                               icp_normals=raw_n[::8], seg_cap=seg_cap)
        return jax.jit(run)

    def stage_keys(raw_p, raw_n):
        vox = vox_of(raw_p, raw_n)
        return ppf_ops.pairwise_ppf_keys(
            vox.points, vox.normals, desc.d_dist, cfg.d_angle,
            desc.max_dist_bin, ref_indices=ref_idx)

    vrun = jax.jit(lambda p, n: voting_block.cast_votes_block(
        *stage_keys(p, n), desc.fast_tables.block, desc.n_points,
        cfg.d_angle, cap, seg_cap=seg_cap))
    vrun_corr = jax.jit(lambda p, n: voting_corr.cast_votes_corr(
        stage_keys(p, n)[0], stage_keys(p, n)[1], desc.corr_tables,
        desc.n_points))
    run_fast = pipeline(cfg)
    run_corr = pipeline(cfg_corr)

    # ---- On-device tally cross-validation gate (untimed, one rep) ----
    # The test suite runs on a CPU mesh (conftest), so the Pallas tally
    # lowering is exercised ONLY here on real hardware: the block engine
    # must be bit-identical to the fast engine (same fixed-point α, fully
    # disjoint tally path), and within a bounded α-bin-boundary flip rate
    # of the float32 readable engine (see tally_bitequal_check). A row-map
    # or output-routing bug in the kernel (the round-3 class, commit
    # 6d2fa95) fails the bench loudly instead of shipping a wrong number.
    from objective_slam_tpu.ops import voting_fast
    cap_ref_gate = drost._next_cap(max(totals))
    cap_fast_gate = drost._next_cap(
        max(totals) + voting_fast.TALLY_CHUNK * n_ref)

    @jax.jit
    def _tally_pair(raw_p, raw_n):
        keys, alpha = stage_keys(raw_p, raw_n)
        return tally_bitequal_check(keys, alpha, desc, cfg.d_angle, cap,
                                    seg_cap, cap_fast_gate, cap_ref_gate)

    sp0_dev = jax.device_put(scenes[0][0])
    sn0_dev = jax.device_put(scenes[0][1])
    eq_bf, eq_votes, ref_flips, gate_ovf = _tally_pair(sp0_dev, sn0_dev)
    tally_bitequal = bool(eq_bf)
    ref_flips = int(ref_flips)
    assert not bool(gate_ovf), "tally gate: an engine overflowed its cap"
    assert tally_bitequal, (
        "ON-DEVICE TALLY MISMATCH: block engine accumulator is not "
        "bit-equal to the fast engine on this hardware")
    assert bool(eq_votes), "tally gate: vote totals differ vs readable"
    ref_flip_rate = ref_flips / max(totals[0], 1)
    assert ref_flip_rate < 1e-4, (
        f"tally gate: {ref_flips} α-bin flips vs readable engine "
        f"({ref_flip_rate:.2e}/vote) exceeds the quantization bound")
    _log(f"tally gate: block==fast {tally_bitequal}, readable flips "
         f"{ref_flips}/{totals[0]} ({ref_flip_rate:.2e}/vote)")

    # ---- Production sized-match latency (count pass INSIDE the timing) ---
    # bench's main loop times _match_core with caps precomputed outside
    # (honest for a warmed static pipeline); drost.match pays an exact
    # count pass + host sync per call — the reference keeps its count/scan
    # phase inside the timed lookup (model.cu:99-121), so report this
    # configuration too.
    run_sized = make_sized_runner(desc, cfg, jax.jit(vox_of))

    # Device-resident inputs; fresh jitter per rep defeats result caching
    # without changing voxel occupancy (1e-6 << leaf).
    def rep_args(sp_dev, sn_dev):
        return [(sp_dev + jnp.float32((r + 1) * 1e-6), sn_dev)
                for r in range(REPS)]

    e2e_ms, e2e_corr_ms, vote_s, corr_s, sized_ms = [], [], [], [], []
    matches = []
    n_votes = None
    for si, (sp, sn, truths) in enumerate(scenes):
        sp_dev = jax.device_put(sp)
        sn_dev = jax.device_put(sn)
        args = rep_args(sp_dev, sn_dev)
        warm = (sp_dev, sn_dev)

        dt, res = _time(run_fast, args, warm)
        e2e_ms.append(dt * 1e3)

        # Sized-match latency: drost.match per rep (count pass + host
        # sync + match; compiles are warmed, the sync is the point).
        r_w = run_sized(*warm)
        jax.block_until_ready(r_w.pose)
        n_sized = min(REPS, 8)
        t0 = time.perf_counter()
        for a in args[:n_sized]:
            r_s = run_sized(*a)
            jax.block_until_ready(r_s.pose)
        sized_ms.append((time.perf_counter() - t0) / n_sized * 1e3)
        dt, res_c = _time(run_corr, args, warm)
        e2e_corr_ms.append(dt * 1e3)
        dt, vres = _time(vrun, args, warm)
        vote_s.append(dt)
        dt, cres = _time(vrun_corr, args, warm)
        corr_s.append(dt)
        nv = int(vres.num_votes)
        assert int(cres.num_votes) == nv
        n_votes = nv if n_votes is None else n_votes

        v = validate_best(np.asarray(res.pose), truths, desc.diameter, cfg)
        v_c = validate_best(np.asarray(res_c.pose), truths, desc.diameter,
                            cfg)
        matches.append({
            "seed": si, "num_votes": nv,
            "match": bool(v.match), "trans_err": v.trans_err,
            "rot_err_deg": math.degrees(v.rot_err),
            "match_corr": bool(v_c.match),
            "rot_err_corr_deg": math.degrees(v_c.rot_err),
            "overflowed": bool(res.overflowed),
        })
        _log(f"seed {si}: e2e {e2e_ms[-1]:.1f}ms "
             f"exact {vote_s[-1]*1e3:.1f}ms corr {corr_s[-1]*1e3:.1f}ms "
             f"votes {nv} match {v.match} rot {matches[-1]['rot_err_deg']:.2f}")

    # ---- Multi-instance recall (bin picking; untimed accuracy stage) ----
    # The reference discards everything but the argmax winner
    # (model.cu:293-295) even though the candidate list holds every
    # instance's peak; extract_instances recovers all of them. Center-cell
    # quirk ON and a larger top-K per its docstring.
    cfg_mi = PPFConfig(max_poses=1024, ref_point_df=5, engine="fast",
                       cluster_center_cell=True)
    run_mi = pipeline(cfg_mi)
    inst_found = []
    for si, (sp, sn, truths) in enumerate(scenes):
        res_mi = run_mi(jax.device_put(sp), jax.device_put(sn))
        poses_mi, _counts_mi = drost.extract_instances(
            res_mi, desc.diameter, max_instances=2 * N_INSTANCES)
        found = 0
        for T in truths:
            if any(validation.validate_pose(p, T, desc.diameter,
                                            cfg_mi).match
                   for p in poses_mi):
                found += 1
        inst_found.append(found)
        _log(f"seed {si}: instances {found}/{len(truths)} "
             f"(candidates {len(poses_mi)})")

    # ---- Estimated-normals run (xyz-only sensor frame; timed) ----
    # A partial view of seed-0's scene from a fixed sensor viewpoint. BOTH
    # sides carry normals estimated ON DEVICE from xyz alone
    # (estimate_normals_grid): the model with outward orientation
    # (offline, like preparing a model from a raw scan), the scene with
    # viewpoint orientation per frame (timed). Estimating only the scene
    # would MIX conventions: blob_cloud's analytic normals are RADIAL by
    # construction, ~30 deg off the true bumpy surface normal an estimator
    # recovers — consistent estimation on both sides is the real-scan
    # configuration (PCL NormalEstimation upstream of the reference's
    # PLYs, SURVEY.md §7 step 2).
    from objective_slam_tpu.utils import synthetic

    sp0, sn0, truths0 = scenes[0]
    viewpoint = np.array([0.0, -14.0, 7.0], np.float32)
    vis_mask = synthetic.partial_view(sp0, sn0, viewpoint)
    vis_p = np.asarray(sp0[vis_mask], np.float32)
    nrm_radius = 0.6 * float(scene_leaf)

    lo_m = mp_raw.min(axis=0)
    hi_m = mp_raw.max(axis=0)
    dims_m = tuple(int(d) + 1 for d in
                   np.floor((hi_m - lo_m) / nrm_radius).astype(np.int64))
    mn_est = np.asarray(pc.estimate_normals_grid(
        mp_raw, nrm_radius, orient="outward", dims=dims_m))
    mp_e, mn_e = pc.voxel_downsample_np(mp_raw, mn_est, d_dist)
    desc_est = ost.build_model_description(mp_e, mn_e, cfg, d_dist=d_dist)

    lo_h = vis_p.min(axis=0)
    hi_h = vis_p.max(axis=0)
    dims = tuple(int(d) + 1 for d in
                 np.floor((hi_h - lo_h) / nrm_radius).astype(np.int64))

    def est_normals(p):
        return pc.estimate_normals_grid(p, nrm_radius, viewpoint=viewpoint,
                                        orient="viewpoint", dims=dims)

    vis_occ = int(pc.voxel_downsample(
        vis_p, np.zeros_like(vis_p), scene_leaf,
        capacity=len(vis_p)).num_voxels)
    # 15% headroom like every other static capacity in this file (CLAUDE.md
    # rule), and the dropped flag is CHECKED below on the most-jittered
    # input — an overflow silently merges the tail into one garbage cell.
    vis_cap = ((int(vis_occ * 1.15) + 127) // 128) * 128
    vox_chk = pc.voxel_downsample(
        vis_p + np.float32(REPS * 1e-6), np.zeros_like(vis_p),
        scene_leaf, capacity=vis_cap)
    assert not bool(vox_chk.dropped), \
        f"est-normals voxel capacity {vis_cap} overflowed"
    tE, rE, gE = _count_votes(
        desc_est, *(lambda v: (v.points, v.normals))(
            pc.voxel_downsample(vis_p, np.asarray(est_normals(vis_p)),
                                scene_leaf, capacity=vis_cap)),
        cfg.ref_point_df, cfg.d_angle)
    cap_e = drost._next_cap((rE + voting_block.CHUNK_ROWS *
                             ((vis_cap + cfg.ref_point_df - 1)
                              // cfg.ref_point_df)) * 128)
    seg_e = drost._next_cap(max(gE, 1024))

    def run_est(raw_p):
        nrm = est_normals(raw_p)
        vox = pc.voxel_downsample(raw_p, nrm, scene_leaf, capacity=vis_cap)
        return _match_core(desc_est, vox.points, vox.normals,
                           ref_point_df=cfg.ref_point_df, vote_cap=cap_e,
                           config=cfg, icp_points=raw_p[::2], seg_cap=seg_e)
    run_est_j = jax.jit(run_est)
    nrm_j = jax.jit(lambda p: jnp.sum(est_normals(p) * p))
    vis_dev = jax.device_put(vis_p)
    est_args = [(vis_dev + jnp.float32((r + 1) * 1e-6),)
                for r in range(REPS)]
    dt_n, _ = _time(nrm_j, est_args, (vis_dev,))
    dt_e, res_est = _time(run_est_j, est_args, (vis_dev,))
    v_est = validate_best(np.asarray(res_est.pose), truths0,
                          desc_est.diameter, cfg)
    _log(f"est-normals: {len(vis_p)} visible pts, normals {dt_n*1e3:.1f}ms, "
         f"e2e {dt_e*1e3:.1f}ms, match {v_est.match} "
         f"rot {math.degrees(v_est.rot_err):.2f}")

    mean_votes = float(np.mean([m["num_votes"] for m in matches]))
    exact_vps = mean_votes / float(np.mean(vote_s))
    corr_vps = mean_votes / float(np.mean(corr_s))
    headline_engine = "exact-block" if exact_vps >= corr_vps else \
        "correlation"
    votes_per_s = max(exact_vps, corr_vps)

    print(json.dumps({
        "metric": "ppf_votes_per_sec_per_chip",
        "value": votes_per_s,
        "unit": "votes/s",
        "vs_baseline": votes_per_s / 1e9,
        "extra": {
            "e2e_pose_ms_100k_scene": float(np.mean(e2e_ms)),
            "e2e_with_sizing_ms": float(np.mean(sized_ms)),
            "tally_bitequal_on_device": tally_bitequal,
            "readable_engine_flip_votes": ref_flips,
            "readable_engine_flip_rate": ref_flip_rate,
            "e2e_corr_pose_ms": float(np.mean(e2e_corr_ms)),
            "e2e_target_ms": 30.0,
            "engine_headline": headline_engine,
            "exact_engine_votes_per_s": exact_vps,
            "exact_engine_voting_ms": float(np.mean(vote_s)) * 1e3,
            "correlation_votes_per_s": corr_vps,
            "correlation_voting_ms": float(np.mean(corr_s)) * 1e3,
            "icp_in_e2e": True,
            "seeds": NSEEDS, "reps": REPS,
            "num_votes": n_votes,
            "vote_cap": cap,
            "model_points": int(desc.n_points),
            "scene_voxels": occ,
            "scene_voxel_capacity": vox_capacity,
            "pose_match": all(m["match"] for m in matches),
            "pose_match_corr": all(m["match_corr"] for m in matches),
            "trans_err": float(np.mean([m["trans_err"] for m in matches])),
            "rot_err_deg": float(np.mean([m["rot_err_deg"]
                                          for m in matches])),
            "per_seed": matches,
            "overflowed": any(m["overflowed"] for m in matches),
            "instances_found": inst_found,
            "instances_planted": N_INSTANCES,
            "instance_recall": float(np.mean(inst_found)) / N_INSTANCES,
            "est_normals": {
                "visible_points": int(len(vis_p)),
                "normals_ms": dt_n * 1e3,
                "e2e_ms": dt_e * 1e3,
                "match": bool(v_est.match),
                "rot_err_deg": math.degrees(v_est.rot_err),
            },
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
