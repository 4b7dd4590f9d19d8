"""PPF generation microbenchmark — the reference's ppf_timer.m equivalent.

The MATLAB prototype times 256x256 = 65,536 point-pair features
(matlab/ppf_timer.m:1-12) and writes shared random fixtures for the CUDA
side (matlab/utils/cuda_float3_c_write.m). This tool times the same-shape
pairwise PPF stage on the current JAX backend and can dump the fixture
clouds (as .npy + PLY) for cross-implementation comparisons.

Usage: python tools/ppf_timer.py [n=256] [--dump out_prefix]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("n", type=int, nargs="?", default=256)
    p.add_argument("--dump", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    from objective_slam_tpu.ops import ppf as ppf_ops
    from objective_slam_tpu.utils import ply

    rng = np.random.default_rng(0)
    pts = rng.random((args.n, 3)).astype(np.float32)
    nrm = rng.normal(size=(args.n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm.astype(np.float32)

    if args.dump:
        np.save(args.dump + "_points.npy", pts)
        np.save(args.dump + "_normals.npy", nrm)
        ply.write_ply(args.dump + ".ply", pts, nrm)
        print(f"fixtures written: {args.dump}_points.npy / _normals.npy "
              f"/ .ply")

    d_angle = 2 * np.pi / 30
    f = jax.jit(lambda a, b: ppf_ops.pairwise_ppf_keys(
        a, b, 0.1, d_angle, 64))
    keys, alpha = f(pts, nrm)
    jax.block_until_ready(keys)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        keys, alpha = f(pts, nrm)
    jax.block_until_ready(keys)
    dt = (time.perf_counter() - t0) / reps
    n_ppf = args.n * args.n
    print(f"{args.n}x{args.n} = {n_ppf} PPFs (keys+alpha) on "
          f"{jax.default_backend()}: {dt*1e3:.3f} ms "
          f"({n_ppf/dt/1e6:.1f} M PPF/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
