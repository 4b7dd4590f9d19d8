"""Stage ablation of the block-expansion voting engine at bench scale.

Times the full engine and its internal stages on the benchmark workload.
The axon tunnel adds a fixed ~25-30 ms dispatch+readback overhead per
timed call and caches identical-input results, so every rep must see fresh
inputs; stage deltas are computed against a trivial-reduction baseline.

Usage: python tools/ablate_block.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def wall(fn, args_list):
    import jax
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    for o in outs:
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    return (time.perf_counter() - t0) / len(args_list)


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

    # fresh inputs per rep: jitter the scene points (keeps sizes similar)
    REPS = 4
    def scenes():
        out = []
        for i in range(REPS):
            jit_p = sp + jnp.float32(1e-6 * (i + 1))
            out.append((jit_p, sn))
        return out

    f_base = jax.jit(lambda p, q: jnp.sum(p, dtype=jnp.float32))
    base = wall(f_base, scenes())
    print(f"[baseline]       {base*1e3:9.1f} ms", flush=True)

    dt = wall(f_keys, scenes())
    print(f"[keys]           {(dt)*1e3:9.1f} ms (delta {(dt-base)*1e3:7.1f})",
          flush=True)

    f_dict = jax.jit(lambda p, q: vb._dict_match(
        f_keys(p, q)[0].reshape(-1), bt))
    dt_d = wall(f_dict, scenes())
    print(f"[keys+dict]      {dt_d*1e3:9.1f} ms (delta {(dt_d-dt)*1e3:7.1f})",
          flush=True)

    f_block = jax.jit(lambda p, q: vb.cast_votes_block(
        *f_keys(p, q), bt, desc.n_points, cfg.d_angle, cap,
        seg_cap=seg_cap))
    dt_b = wall(f_block, scenes())
    votes_per_s = total / (dt_b - base)
    print(f"[block full]     {dt_b*1e3:9.1f} ms (delta {(dt_b-base)*1e3:7.1f})"
          f"  -> {votes_per_s/1e9:.3f} Gvotes/s (delta-based)", flush=True)

    # expansion alone (dict + fills + row gather; everything but the tally)
    f_exp = jax.jit(lambda p, q: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.view(jnp.int32) if x.dtype == jnp.uint32 else
                          x.astype(jnp.int32), dtype=jnp.int32),
        vb._expand(*f_keys(p, q), bt, cap, vb.CHUNK_ROWS,
                   seg_cap)[:3]))
    dt_e = wall(f_exp, scenes())
    print(f"[keys+expand]    {dt_e*1e3:9.1f} ms (delta {(dt_e-dt)*1e3:7.1f}"
          f" over keys)", flush=True)

    # tally alone at cap scale (synthetic inputs)
    row_cap = cap // 128
    pp_r = jnp.asarray(rng.integers(0, 2**31, size=(row_cap, 128),
                                    dtype=np.int64).astype(np.uint32))
    al_r = jnp.asarray(rng.integers(0, 1 << 22,
                                    size=(row_cap,)).astype(np.int32))
    lv_r = jnp.asarray(rng.integers(0, 129,
                                    size=(row_cap,)).astype(np.int32))
    rcs = jnp.asarray((np.arange(R) * (row_cap // max(R, 1))
                       // vb.CHUNK_ROWS * vb.CHUNK_ROWS).astype(np.int32))
    f_tally = jax.jit(lambda p_, a_, l_: vb._tally(
        p_, a_, l_, r_of_chunk_start=rcs, R=R, n_model=desc.n_points,
        d_angle=cfg.d_angle, chunk_rows=vb.CHUNK_ROWS, row_cap=row_cap))
    args_t = []
    for i in range(4):
        args_t.append((pp_r, jnp.asarray(
            rng.integers(0, 1 << 22, size=(row_cap,)).astype(np.int32)),
            lv_r))
    dt_t = wall(f_tally, args_t)
    print(f"[tally only]     {dt_t*1e3:9.1f} ms (delta {(dt_t-base)*1e3:7.1f})"
          f"  {cap/(dt_t-base)/1e9:.2f} Gslots/s", flush=True)

    # row gather alone
    src = jnp.asarray(rng.integers(0, bt.n_rows,
                                   size=(row_cap,)).astype(np.int32))
    f_g = jax.jit(lambda s_: jnp.sum(jnp.take(bt.pair2d, s_, axis=0)
                                     .view(jnp.int32), dtype=jnp.int32))
    args_g = [(jnp.asarray(rng.integers(0, bt.n_rows, size=(row_cap,))
                           .astype(np.int32)),) for _ in range(4)]
    dt_g = wall(f_g, args_g)
    print(f"[row gather]     {dt_g*1e3:9.1f} ms (delta {(dt_g-base)*1e3:7.1f})",
          flush=True)

    # legacy fast engine for comparison
    cap_fast = ((total + vf.TALLY_CHUNK * R) * 102 // 100
                // vf.TALLY_CHUNK + 1) * vf.TALLY_CHUNK
    f_fast = jax.jit(lambda p, q: vf.cast_votes_fast(
        *f_keys(p, q), desc.fast_tables, desc.n_points, cfg.d_angle,
        cap_fast))
    dt_f = wall(f_fast, scenes())
    print(f"[legacy fast]    {dt_f*1e3:9.1f} ms "
          f"-> {total/(dt_f-base)/1e9:.3f} Gvotes/s (delta-based)",
          flush=True)

    # equality check at bench scale
    ob = f_block(sp, sn)
    of = f_fast(sp, sn)
    eq = bool(jnp.all(ob.accumulator == of.accumulator))
    print(f"accumulators equal: {eq}  votes {int(ob.num_votes)} vs "
          f"{int(of.num_votes)}", flush=True)


if __name__ == "__main__":
    main()
