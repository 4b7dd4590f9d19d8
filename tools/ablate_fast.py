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
    mp_raw, mn_raw = benchmod.build_model(rng)
    scene_raw, scene_nrm_raw, T_true = benchmod.build_scene(rng, mp_raw,
                                                            mn_raw)
    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    print(f"model {desc.n_points} pts; table rot: "
          f"K={desc.fast_tables.cnt_off.rot} "
          f"P={desc.fast_tables.pair_packed.rot}", flush=True)

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
    keys, alpha_s = f_keys(sp, sn)
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

    f_cnt = jax.jit(lambda kq: vf.packed_lookup(t.cnt_off, kq))
    co = f_cnt(keys_q)
    dt = wall(f_cnt, keys_q)
    print(f"[cnt_off tga]   {dt*1e3:9.1f} ms ({S/dt/1e9:.2f} Glookups/s)",
          flush=True)
    cnt_q = (co & jnp.uint32((1 << vf.CNT_BITS) - 1)).astype(jnp.int32)

    cnt = jnp.where(valid, cnt_q.reshape(-1)[:S], 0)
    total = int(jnp.sum(cnt))
    n_refs = R
    cap = ((int((total + vf.TALLY_CHUNK * n_refs) * 1.02)
            + vf.TALLY_CHUNK - 1) // vf.TALLY_CHUNK) * vf.TALLY_CHUNK
    print(f"votes {total}; cap {cap}", flush=True)

    f_full = jax.jit(lambda k, a: vf.cast_votes_fast(
        k, a, t, desc.n_points, cfg.d_angle, cap))
    out = f_full(keys, alpha_s)
    dt = wall(f_full, keys, alpha_s)
    print(f"[cast_votes_fast] {dt*1e3:7.1f} ms "
          f"({int(out.num_votes)/dt/1e9:.3f} Gvotes/s)", flush=True)

    # pure per-vote pair lookup at cap
    slots = jnp.asarray(rng.integers(0, max(1, p_len := 1), size=(1,)))
    P_max = t.pair_packed.height * 128 - 1
    slot = jnp.asarray(rng.integers(0, P_max, size=(cap,)).astype(np.int32))
    f_pl = jax.jit(lambda s: vf.packed_lookup(t.pair_packed,
                                              s.reshape(-1, 128)))
    o = f_pl(slot)
    dt = wall(f_pl, slot)
    print(f"[pair tga CAP]  {dt*1e3:9.1f} ms ({cap/dt/1e9:.2f} Glookups/s)",
          flush=True)

    # cummax + cumsum at cap
    x = jnp.asarray(rng.integers(0, 100, size=(cap,)).astype(np.int32))
    f_cm = jax.jit(lambda v: jax.lax.cummax(v, axis=0)[-1]
                   + jnp.cumsum(v, dtype=jnp.int32)[-1])
    o = f_cm(x)
    dt = wall(f_cm, x)
    print(f"[cummax+cumsum CAP] {dt*1e3:5.1f} ms", flush=True)

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
        co2 = vf.packed_lookup(t.cnt_off, kq).reshape(-1)[:S]
        c = jnp.where(va, (co2 & jnp.uint32((1 << vf.CNT_BITS) - 1))
                      .astype(jnp.int32), 0)
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
