"""Stage ablation of the fast voting engine at bench scale (dev tool).

Times each internal stage of cast_votes_fast as a separate jit at realistic
sizes. Trust only multi-hundred-ms aggregates (the axon tunnel's
result-caching makes identical-input microbenchmarks lie).

Usage: python tools/ablate_fast.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def wall(fn, *args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.ops import ppf as ppf_ops, transforms as tr
    from objective_slam_tpu.ops import voting_fast as vf
    from objective_slam_tpu.utils import pointcloud as pc
    import bench as benchmod

    rng = np.random.default_rng(0)
    mp_raw, mn_raw, scene_raw, scene_nrm_raw, T_true = benchmod.build_scene(
        rng)
    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    print(f"model {desc.n_points} pts; table rot: "
          f"K={desc.fast_tables.counts.rot} P={desc.fast_tables.pair_mr.rot}",
          flush=True)

    vox = pc.voxel_downsample(scene_raw, scene_nrm_raw, d_dist,
                              capacity=4096)
    sp = jnp.asarray(vox.points)
    sn = jnp.asarray(vox.normals)
    n = 4096
    ref_idx = jnp.arange(0, n, cfg.ref_point_df, dtype=jnp.int32)
    R = ref_idx.shape[0]

    f_keys = jax.jit(lambda p, q: ppf_ops.pairwise_ppf_keys(
        p, q, desc.d_dist, cfg.d_angle, desc.max_dist_bin,
        ref_indices=ref_idx))
    keys, _ = f_keys(sp, sn)
    dt = wall(f_keys, sp, sn)
    S = R * n
    print(f"[keys]          {dt*1e3:9.1f} ms ({S/dt/1e9:.2f} Gpairs/s)",
          flush=True)

    t = desc.fast_tables
    flat_keys = keys.reshape(-1)
    valid = flat_keys != ppf_ops.INVALID_KEY
    safe = jnp.where(valid, flat_keys, 0)
    S_pad = ((S + 127) // 128) * 128
    keys_q = jnp.concatenate([safe, jnp.zeros((S_pad - S,), jnp.int32)]) \
        .reshape(-1, 128)

    f_cnt = jax.jit(lambda kq: (vf.packed_lookup(t.counts, kq),
                                vf.packed_lookup(t.offsets, kq)))
    cnt_q, off_q = f_cnt(keys_q)
    dt = wall(f_cnt, keys_q)
    print(f"[cnt/off tga]   {dt*1e3:9.1f} ms ({2*S/dt/1e9:.2f} Glookups/s)",
          flush=True)

    cnt = jnp.where(valid, cnt_q.reshape(-1)[:S], 0)
    total = int(jnp.sum(cnt))
    n_refs = R
    cap = 1 << int(np.ceil(np.log2(total + vf.TALLY_CHUNK * n_refs)))
    print(f"votes {total}; cap {cap}", flush=True)

    s_beta, s_gamma = tr.canonical_angles(sp[ref_idx], sn[ref_idx])

    f_full = jax.jit(lambda p, q, k: vf.cast_votes_fast(
        p, q, ref_idx, s_beta, s_gamma, k, t, desc.n_points, cfg.d_angle,
        cap))
    out = f_full(sp, sn, keys)
    dt = wall(f_full, sp, sn, keys)
    print(f"[cast_votes_fast] {dt*1e3:7.1f} ms "
          f"({int(out.num_votes)/dt/1e9:.3f} Gvotes/s)", flush=True)

    # tally only (random inputs at cap scale)
    nc = cap // vf.TALLY_CHUNK
    m_r = jnp.asarray(rng.integers(0, desc.n_points,
                                   size=(cap,)).astype(np.int32))
    a_b = jnp.asarray(rng.integers(0, 31, size=(cap,)).astype(np.int32))
    ok = jnp.asarray(rng.random(size=(cap,)) < float(total) / cap)
    rsp = jnp.asarray(
        (np.arange(R) * (cap // max(R, 1))).astype(np.int32)
        // vf.TALLY_CHUNK * vf.TALLY_CHUNK)
    f_tally = jax.jit(lambda m, a, o: vf._mxu_tally(
        m, a, o, r_of_chunk_start=rsp, R=R, n_model=desc.n_points,
        chunk=vf.TALLY_CHUNK, vote_cap=cap))
    acc = f_tally(m_r, a_b, ok)
    dt = wall(f_tally, m_r, a_b, ok)
    print(f"[mxu tally]     {dt*1e3:9.1f} ms ({cap/dt/1e9:.2f} Gslots/s)",
          flush=True)

    # fills only
    def fills(k):
        fk = k.reshape(-1)
        va = fk != ppf_ops.INVALID_KEY
        sk = jnp.where(va, fk, 0)
        kq = jnp.concatenate([sk, jnp.zeros((S_pad - S,), jnp.int32)]) \
            .reshape(-1, 128)
        c = jnp.where(va, vf.packed_lookup(t.counts, kq).reshape(-1)[:S], 0)
        voffs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(c, dtype=jnp.int32)[:-1]])
        heads = jnp.where(c > 0, voffs, cap)
        s_iota = jnp.arange(S, dtype=jnp.int32)
        sp_f = jax.lax.cummax(jnp.zeros((cap,), jnp.int32)
                              .at[heads].max(s_iota, mode="drop"), axis=0)
        st_f = jax.lax.cummax(jnp.zeros((cap,), jnp.int32)
                              .at[heads].max(heads, mode="drop"), axis=0)
        d = jnp.zeros((cap,), jnp.int32).at[heads].add(c, mode="drop")
        d = d.at[jnp.where(c > 0, voffs + c, cap)].add(-c, mode="drop")
        cf = jnp.cumsum(d, dtype=jnp.int32)
        return sp_f[-1] + st_f[-1] + cf[-1]
    f_fills = jax.jit(fills)
    out2 = f_fills(keys)
    dt = wall(f_fills, keys)
    print(f"[fills]         {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
