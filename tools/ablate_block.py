"""Stage ablation of the block-expansion voting engine at bench scale.

Methodology (hard-won on the axon tunnel): per-call dispatch overhead is
~25 ms with several-ms variance, so every measurement pipelines REPS
dispatches of PRE-BUILT device inputs (block only at the end) — the RPC
latency overlaps and the per-rep figure approaches true device time. Inputs
are jittered per rep (the tunnel caches identical-input dispatches).

Usage: python tools/ablate_block.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 16


def main():
    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.ops import ppf as ppf_ops
    from objective_slam_tpu.ops import voting_block as vb
    from objective_slam_tpu.ops import voting_fast as vf
    from objective_slam_tpu.utils import pointcloud as pc
    import bench as benchmod

    rng = np.random.default_rng(0)
    mp_raw, mn_raw = benchmod.build_model(rng)
    scene_raw, scene_nrm_raw, _truths = benchmod.build_scene(rng, mp_raw,
                                                             mn_raw)
    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    bt = desc.fast_tables.block
    print(f"model {desc.n_points} pts; K_occ={bt.k_occ} "
          f"pair rows={bt.n_rows}", flush=True)

    vox = pc.voxel_downsample(scene_raw, scene_nrm_raw, d_dist,
                              capacity=2816)
    sp = jnp.asarray(vox.points)
    sn = jnp.asarray(vox.normals)
    n = 2816
    ref_idx = jnp.arange(0, n, cfg.ref_point_df, dtype=jnp.int32)
    R = ref_idx.shape[0]

    f_keys = jax.jit(lambda p, q: ppf_ops.pairwise_ppf_keys(
        p, q, desc.d_dist, cfg.d_angle, desc.max_dist_bin,
        ref_indices=ref_idx))
    keys, alpha_s = f_keys(sp, sn)
    S = R * n

    # sizes
    cnt_h, brs_h = (np.asarray(x) for x in vb._dict_match(
        keys.reshape(-1), bt))
    total = int(cnt_h.astype(np.int64).sum())
    rows = int(((cnt_h + 127) // 128).astype(np.int64).sum())
    cap = ((rows + vb.CHUNK_ROWS * R) * 128)
    cap = ((cap + vb.CHUNK_ROWS * 128 - 1)
           // (vb.CHUNK_ROWS * 128)) * (vb.CHUNK_ROWS * 128)
    nseg = int((cnt_h > 0).sum())
    from objective_slam_tpu.models.drost import _next_cap
    seg_cap = _next_cap(max(nseg, 1024))
    print(f"S={S} votes={total} rows={rows} nonzero segs={nseg} "
          f"seg_cap={seg_cap} cap={cap} ({cap//128} rows)", flush=True)

    # Fresh device inputs per rep, built BEFORE timing.
    args = [(sp + jnp.float32(1e-6 * (i + 1)), sn) for i in range(REPS)]
    jax.block_until_ready(args)

    def wall(fn, label):
        out = fn(*args[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:18s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    wall(jax.jit(lambda p, q: jnp.sum(p, dtype=jnp.float32)), "[baseline]")
    # Bench parity stage: voxel downsample of the RAW scan (bench's vrun
    # re-voxelizes per rep; this isolates that cost from [keys]).
    raw_args = [(jnp.asarray(scene_raw) + jnp.float32(1e-6 * (i + 1)),
                 jnp.asarray(scene_nrm_raw)) for i in range(REPS)]
    jax.block_until_ready(raw_args)

    def wall_raw(fn, label):
        out = fn(*raw_args[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*a) for a in raw_args]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:18s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    wall_raw(jax.jit(lambda p, q: pc.voxel_downsample(
        p, q, d_dist, capacity=n).points), "[vox raw->2816]")
    wall(f_keys, "[keys]")
    wall(jax.jit(lambda p, q: vb._dict_match(
        f_keys(p, q)[0].reshape(-1), bt)), "[keys+dict]")

    f_block = jax.jit(lambda p, q: vb.cast_votes_block(
        *f_keys(p, q), bt, desc.n_points, cfg.d_angle, cap,
        seg_cap=seg_cap))
    dt_b = wall(f_block, "[block full]")
    print(f"  -> {total/dt_b/1e9:.3f} Gvotes/s", flush=True)

    # expansion alone (dict + compaction + fills + row gather; no tally)
    f_exp = jax.jit(lambda p, q: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.view(jnp.int32) if x.dtype == jnp.uint32 else
                          x.astype(jnp.int32), dtype=jnp.int32),
        vb._expand(*f_keys(p, q), bt, cap, vb.CHUNK_ROWS,
                   seg_cap)[:2]))
    wall(f_exp, "[keys+expand]")

    # legacy fast engine for comparison
    cap_fast = ((total + vf.TALLY_CHUNK * R) * 102 // 100
                // vf.TALLY_CHUNK + 1) * vf.TALLY_CHUNK
    f_fast = jax.jit(lambda p, q: vf.cast_votes_fast(
        *f_keys(p, q), desc.fast_tables, desc.n_points, cfg.d_angle,
        cap_fast))
    dt_f = wall(f_fast, "[legacy fast]")
    print(f"  -> {total/dt_f/1e9:.3f} Gvotes/s", flush=True)

    # equality check at bench scale
    ob = f_block(sp, sn)
    of = f_fast(sp, sn)
    eq = bool(jnp.all(ob.accumulator == of.accumulator))
    print(f"accumulators equal: {eq}  votes {int(ob.num_votes)} vs "
          f"{int(of.num_votes)}", flush=True)


if __name__ == "__main__":
    main()
