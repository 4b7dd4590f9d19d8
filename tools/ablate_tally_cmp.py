"""Ablation: tally one-hot compare dtype + sized-match latency profile.

Two measurements on the real TPU, bench-scale (one 100k scene):

1. `cast_votes_block` wall time with TALLY_CMP_DTYPE in {int32, int16}.
   The in-kernel one-hot build is ~224 iota compares per vote slot (the
   measured VPU bottleneck after round-4's _precode); sub-32-bit vector
   compares can pack lanes. Accumulators are checked equal across dtypes
   on identical inputs before timing.

2. A stage profile of the production sized-match path (drost.match with
   the count pass inside): voxelize / count+host-sync / strided ICP
   slices / jitted match, each timed separately over jittered reps — to
   locate where BENCH_r05's e2e_with_sizing_ms (723 ms vs the 28 ms warm
   pipeline) actually goes.

Usage: python tools/ablate_tally_cmp.py  (TPU; ~3 min)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models import drost
    from objective_slam_tpu.ops import ppf as ppf_ops, voting_block
    from objective_slam_tpu.utils import pointcloud as pc
    import bench

    rng = np.random.default_rng(0)
    mp_raw, mn_raw = bench.build_model(rng)
    sp, sn, _ = bench.build_scene(np.random.default_rng(0), mp_raw, mn_raw)
    cfg = PPFConfig(max_poses=512, ref_point_df=5, engine="fast",
                    refine_icp=True, icp_iterations=20)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    occ = int(pc.voxel_downsample(sp, sn, d_dist,
                                  capacity=100_000).num_voxels)
    capacity = ((int(occ * 1.02) + 127) // 128) * 128
    vox = pc.voxel_downsample(sp, sn, d_dist, capacity=capacity)
    total, rows, segs = drost._count_votes(desc, vox.points, vox.normals,
                                           cfg.ref_point_df, cfg.d_angle)
    n_ref = (capacity + cfg.ref_point_df - 1) // cfg.ref_point_df
    cap = drost._next_cap((rows + voting_block.CHUNK_ROWS * n_ref) * 128)
    seg_cap = drost._next_cap(max(segs, 1024))
    ref_idx = jnp.arange(0, capacity, cfg.ref_point_df, dtype=jnp.int32)
    keys, alpha = ppf_ops.pairwise_ppf_keys(
        vox.points, vox.normals, desc.d_dist, cfg.d_angle,
        desc.max_dist_bin, ref_indices=ref_idx)
    keys = jax.device_put(keys)
    alpha = jax.device_put(alpha)
    reps = 24
    out = {"votes": total, "cap": cap}

    # ---- 1. compare-dtype sweep (fresh α jitter per rep: the axon
    # tunnel caches identical-input dispatches) ----
    accs = {}
    # uint8 also fits: m_lo <= 127, c_hi <= 255 (both unsigned-exact).
    for dt in ("int32", "int16", "uint8"):
        voting_block.TALLY_CMP_DTYPE = dt
        try:
            f = jax.jit(lambda k, a: voting_block.cast_votes_block(
                k, a, desc.fast_tables.block, desc.n_points, cfg.d_angle,
                cap, seg_cap=seg_cap))
            r0 = f(keys, alpha)
            jax.block_until_ready(r0)
        except Exception as e:          # Mosaic dtype support varies
            out[f"tally_ms_{dt}"] = None
            out[f"error_{dt}"] = f"{type(e).__name__}: {e}"[:300]
            print(f"[ablate] {dt}: FAILED {type(e).__name__}",
                  file=sys.stderr, flush=True)
            continue
        accs[dt] = np.asarray(r0.accumulator)
        args = [alpha + jnp.float32((r + 1) * 1e-7) for r in range(reps)]
        t0 = time.perf_counter()
        outs = [f(keys, a) for a in args]
        jax.block_until_ready(outs)
        out[f"tally_ms_{dt}"] = (time.perf_counter() - t0) / reps * 1e3
        print(f"[ablate] {dt}: {out[f'tally_ms_{dt}']:.2f} ms",
              file=sys.stderr, flush=True)
    voting_block.TALLY_CMP_DTYPE = "int32"
    for dt in ("int16", "uint8"):
        if dt in accs:
            out[f"acc_equal_{dt}_vs_int32"] = bool(
                np.array_equal(accs["int32"], accs[dt]))

    # ---- 2. sized-match stage profile ----
    vox_jit = jax.jit(lambda p, n: pc.voxel_downsample(
        p, n, d_dist, capacity=capacity))
    sp_dev = jax.device_put(sp)
    sn_dev = jax.device_put(sn)
    run_sized = bench.make_sized_runner(desc, cfg, vox_jit)
    r = run_sized(sp_dev, sn_dev)          # warm every compile path
    jax.block_until_ready(r.pose)

    def timed(tag, fn, n=8):
        t0 = time.perf_counter()
        for i in range(n):
            res = fn(i)
            jax.block_until_ready(jax.tree_util.tree_leaves(res)[0])
        out[tag] = (time.perf_counter() - t0) / n * 1e3
        print(f"[ablate] {tag}: {out[tag]:.2f} ms", file=sys.stderr,
              flush=True)

    jitter = [sp_dev + jnp.float32((i + 1) * 1e-6) for i in range(8)]
    vox_w = vox_jit(sp_dev, sn_dev)
    timed("stage_vox_ms", lambda i: vox_jit(jitter[i], sn_dev))
    timed("stage_count_ms", lambda i: jnp.zeros(()) if drost._count_votes(
        desc, vox_w.points + jnp.float32((i + 1) * 1e-7), vox_w.normals,
        cfg.ref_point_df, cfg.d_angle) is None else jnp.zeros(()))
    timed("stage_slice_ms", lambda i: (jitter[i][::8], sn_dev[::8]))
    timed("stage_full_sized_ms",
          lambda i: run_sized(jitter[i], sn_dev).pose)

    # ---- 3. match_with_state steady state: same production call, caps
    # reused from the previous call — the serving-loop configuration.
    # Expected: the count pass + its host sync drop out; only the
    # voxelize dispatch, the match, and ONE stacked flag readback remain.
    state = None

    def sized_stateful(i):
        nonlocal state
        vox = vox_jit(jitter[i], sn_dev)
        res, state = drost.match_with_state(
            desc, vox.points, vox.normals, cfg, state=state,
            icp_points=jitter[i][::8], icp_normals=sn_dev[::8])
        return res.pose

    sized_stateful(0)                        # cold: sizes caps, compiles
    timed("stage_stateful_sized_ms", sized_stateful)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
