"""Ablation harness: time the pieces of cast_votes on the TPU to find the
dominant cost (gathers vs scatter vs scans). Dev tool, not part of the API.

Usage: python tools/ablate_voting.py [n_scene] [n_model]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, reps=5):
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
    from objective_slam_tpu.ops import ppf as ppf_ops, voting
    from objective_slam_tpu.utils import pointcloud as pc, synthetic

    n_scene = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_model_raw = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    rng = np.random.default_rng(0)
    mp_raw, mn_raw = synthetic.blob_cloud(rng, n_model_raw)
    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    print(f"model: {desc.n_points} pts, {desc.num_keys} keys", flush=True)

    sp, sn, _ = synthetic.plant_model(rng, mp_raw, mn_raw)
    idx = rng.permutation(len(sp))[:n_scene]
    sp, sn = sp[idx].astype(np.float32), sn[idx].astype(np.float32)

    ref_idx = jnp.arange(0, n_scene, cfg.ref_point_df, dtype=jnp.int32)
    keys, alpha = jax.jit(lambda p, n: ppf_ops.pairwise_ppf_keys(
        p, n, desc.d_dist, cfg.d_angle, desc.max_dist_bin,
        ref_indices=ref_idx))(sp, sn)
    jax.block_until_ready(keys)
    R, n = keys.shape
    S = R * n
    print(f"pairs: {R}x{n} = {S}", flush=True)

    t = timeit(jax.jit(lambda p, q: ppf_ops.pairwise_ppf_keys(
        p, q, desc.d_dist, cfg.d_angle, desc.max_dist_bin,
        ref_indices=ref_idx)), sp, sn)
    print(f"[keys+alpha]        {t*1e3:8.2f} ms  ({S/t/1e9:.2f} Gpairs/s)",
          flush=True)

    table = desc.table
    flat_keys = keys.reshape(-1)
    flat_alpha = alpha.reshape(-1)
    valid = flat_keys != ppf_ops.INVALID_KEY
    safe_keys = jnp.where(valid, flat_keys, 0)

    f_cnt = jax.jit(lambda k, v: jnp.where(v, table.counts[k], 0))
    cnt = f_cnt(safe_keys, valid)
    t = timeit(f_cnt, safe_keys, valid)
    print(f"[counts gather S]   {t*1e3:8.2f} ms  ({S/t/1e6:.0f} M/s)",
          flush=True)

    f_scan = jax.jit(lambda c: jnp.cumsum(c, dtype=jnp.int32))
    cums = f_scan(cnt)
    t = timeit(f_scan, cnt)
    print(f"[cumsum S]          {t*1e3:8.2f} ms", flush=True)

    voffs = jnp.concatenate([jnp.zeros((1,), jnp.int32), cums[:-1]])
    total = int(cums[-1])
    cap = 1 << int(np.ceil(np.log2(max(total, 2))))
    print(f"total votes {total}, cap {cap}", flush=True)

    def f_head(voffs, cnt):
        head = jnp.zeros((cap,), jnp.int32)
        sidx = jnp.where(cnt > 0, voffs, cap)
        head = head.at[sidx].max(jnp.arange(S, dtype=jnp.int32), mode="drop")
        return head
    f_head = jax.jit(f_head)
    head = f_head(voffs, cnt)
    t = timeit(f_head, voffs, cnt)
    print(f"[head scatter S]    {t*1e3:8.2f} ms", flush=True)

    f_cummax = jax.jit(lambda h: jax.lax.cummax(h, axis=0))
    sp_votes = f_cummax(head)
    t = timeit(f_cummax, head)
    print(f"[cummax CAP]        {t*1e3:8.2f} ms", flush=True)

    f_g1 = jax.jit(lambda s, v: v[s])
    t = timeit(f_g1, sp_votes, voffs)
    print(f"[voffs[sp] CAP]     {t*1e3:8.2f} ms  ({cap/t/1e6:.0f} M/s)",
          flush=True)
    f_g2 = jax.jit(lambda s, k, a: (k[s], a[s]))
    t = timeit(f_g2, sp_votes, safe_keys, flat_alpha)
    print(f"[key,a_s[sp] CAP]   {t*1e3:8.2f} ms", flush=True)

    v_iota = jnp.arange(cap, dtype=jnp.int32)
    j = v_iota - voffs[sp_votes]
    slot = jnp.clip(table.offsets[safe_keys[sp_votes]] + j, 0,
                    table.pair_mr.shape[0] - 1)
    f_g3 = jax.jit(lambda sl: (table.pair_mr[sl], table.pair_alpha[sl]))
    t = timeit(f_g3, slot)
    print(f"[pair gathers CAP]  {t*1e3:8.2f} ms", flush=True)

    m_r = table.pair_mr[slot]
    a_m = table.pair_alpha[slot]
    a_s = flat_alpha[sp_votes]
    in_range = v_iota < total

    def f_alpha(a_s, a_m):
        two_pi = jnp.float32(2.0 * np.pi)
        alpha = a_s - a_m
        alpha = alpha - two_pi * jnp.floor((alpha + jnp.pi) / two_pi)
        shifted = alpha + jnp.float32(np.pi)
        quant = shifted - jnp.fmod(shifted, jnp.float32(cfg.d_angle))
        return jnp.round(quant / jnp.float32(cfg.d_angle)).astype(jnp.int32)
    f_alpha = jax.jit(f_alpha)
    a_bin = f_alpha(a_s, a_m)
    t = timeit(f_alpha, a_s, a_m)
    print(f"[alpha math CAP]    {t*1e3:8.2f} ms", flush=True)

    r_idx = sp_votes // n
    B = R * desc.n_points * 32
    target = jnp.where(in_range,
                       (r_idx * desc.n_points + m_r) * 32 +
                       jnp.clip(a_bin, 0, 31), B)

    f_scatter = jax.jit(lambda tgt: jnp.zeros((B,), jnp.int32)
                        .at[tgt].add(1, mode="drop"))
    acc = f_scatter(target)
    t = timeit(f_scatter, target)
    print(f"[scatter-add CAP]   {t*1e3:8.2f} ms  ({cap/t/1e6:.0f} M/s)",
          flush=True)

    f_all = jax.jit(lambda k, a: voting.cast_votes(
        k, a, table, desc.n_points, cfg.d_angle, cap))
    out = f_all(keys, alpha)
    t = timeit(f_all, keys, alpha)
    print(f"[cast_votes fused]  {t*1e3:8.2f} ms  "
          f"({int(out.num_votes)/t/1e9:.3f} Gvotes/s)", flush=True)


if __name__ == "__main__":
    main()
