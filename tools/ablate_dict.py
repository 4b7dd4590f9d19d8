"""A/B the digit-split dictionary contraction vs the HIGHEST 6-pass form.

Times voting_block._dict_match at bench scale with DICT_DIGITS toggled, and
the correlation key->rank stage likewise, on the real TPU. Methodology as
tools/ablate_block.py: pipelined reps of pre-built jittered inputs.

Usage: python tools/ablate_dict.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 24


def main():
    import jax
    import jax.numpy as jnp
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.ops import voting_block as vb
    from objective_slam_tpu.utils import pointcloud as pc
    import bench as benchmod

    rng = np.random.default_rng(0)
    mp_raw, mn_raw = benchmod.build_model(rng)
    scene_raw, scene_nrm_raw, _ = benchmod.build_scene(rng, mp_raw, mn_raw)
    cfg = PPFConfig(max_poses=1024, ref_point_df=5)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    bt = desc.fast_tables.block
    vox = pc.voxel_downsample(scene_raw, scene_nrm_raw, d_dist,
                              capacity=2816)
    n = int(vox.points.shape[0])
    S = n * n
    print(f"model {desc.n_points} pts K_occ={bt.k_occ}; scene {n} "
          f"-> S={S}", flush=True)

    # Jittered scene-key batches (tunnel caches identical inputs).
    keys = []
    for r in range(REPS):
        k = np.asarray(
            rng.choice(np.asarray(bt.occ_keys)[: bt.k_occ], size=S)
        ).astype(np.int32)
        miss = rng.random(S) < 0.5
        k[miss] = rng.integers(0, 1 << 22, size=int(miss.sum()))
        keys.append(jax.device_put(jnp.asarray(k)))
    jax.block_until_ready(keys[-1])

    def wall(fn, label):
        outs = [fn(keys[r]) for r in range(2)]          # warm/compile
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [fn(keys[r]) for r in range(REPS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{label:>28}: {dt:8.3f} ms", flush=True)
        return outs[0], dt

    results = {}
    for flag in (False, True):
        vb.DICT_DIGITS = flag
        f = jax.jit(lambda fk: vb._dict_match(fk, bt))
        out, dt = wall(f, f"block dict (digits={flag})")
        results[flag] = (tuple(np.asarray(x) for x in out), dt)

    (cnt_a, brs_a), _ = results[False]
    (cnt_b, brs_b), _ = results[True]
    np.testing.assert_array_equal(cnt_a, cnt_b)
    np.testing.assert_array_equal(brs_a, brs_b)
    print("payload agreement: BIT-EQUAL", flush=True)
    sp = results[False][1] / results[True][1]
    print(f"speedup digits vs HIGHEST: {sp:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
