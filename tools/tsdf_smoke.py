"""256³ TSDF streaming-recognition smoke with timings (real-KinFu scale).

Fuses synthetic depth frames of a tabletop scene (one bumpy-mesh object on
a plane) into a 256³ voxel volume with the sensor-model update (free-space
carving), raycasts a tracking view (trilinear), extracts the surface with
capacity-from-occupancy, and recognizes the object on the fused geometry.

Prints one JSON line with per-stage timings and the recognition result.
Run on the TPU: python tools/tsdf_smoke.py [--dims 256] [--frames 8]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--img", type=int, default=240)
    args = ap.parse_args(argv)

    import jax
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models import tsdf
    from objective_slam_tpu.ops import transforms as tr
    from objective_slam_tpu.utils import pointcloud as pc, synthetic

    rng = np.random.default_rng(0)
    verts, faces = synthetic.bumpy_mesh(subdiv=4, bumps=0.35)
    nrm = pc.mesh_vertex_normals(verts, faces)
    # Object sits at the volume center; a ground plane below.
    obj = verts + np.float32([0, 0, 1.0])
    u = rng.uniform(-2.2, 2.2, size=(20000, 2)).astype(np.float32)
    plane = np.concatenate([u, np.full((len(u), 1), -1.05, np.float32)],
                           axis=1)
    world = np.concatenate([obj, plane]).astype(np.float32)

    D = args.dims
    vs = 5.0 / D                                    # 5 m cube -> 2 cm @256
    vol = tsdf.make_volume(origin=(-2.5, -2.5, -1.5), dims=(D, D, D),
                           voxel_size=vs)
    rec = tsdf.StreamingRecognizer(vol, PPFConfig(
        max_poses=512, ref_point_df=2, refine_icp=True, icp_iterations=8))
    desc = ost.build_model_description(verts, nrm, PPFConfig())
    rec.register_model("blob", desc)

    h = w = args.img
    intr = (0.9 * w, 0.9 * w, w / 2 - 0.5, h / 2 - 0.5)
    t_int = []
    for f in range(args.frames):
        ang = 2 * math.pi * f / args.frames
        eye = np.float32([3.2 * math.cos(ang), 3.2 * math.sin(ang), 1.6])
        T_cw = synthetic.look_at(eye, (0, 0, 0.5))
        depth = synthetic.render_depth(world, T_cw, intr, (h, w))
        t0 = time.perf_counter()
        rec.integrate_depth_frame(depth, intr, T_cw)
        jax.block_until_ready(rec.volume.tsdf)
        t_int.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    occ = int(tsdf.surface_occupancy(rec.volume))
    surf = rec.surface()
    jax.block_until_ready(surf.points)
    t_surf = time.perf_counter() - t0
    assert not bool(surf.overflowed), "capacity-from-occupancy overflowed"

    t0 = time.perf_counter()
    T_wc = np.linalg.inv(synthetic.look_at(
        np.float32([3.2, 0, 1.6]), (0, 0, 0.5)))
    view = tsdf.raycast_depth(rec.volume, intr, T_wc, (h, w))
    jax.block_until_ready(view)
    t_ray = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = rec.recognize()["blob"]
    jax.block_until_ready(out.pose)
    t_match = time.perf_counter() - t0
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = [0, 0, 1.0]
    td, rd = (float(x) for x in tr.ht_dist(np.asarray(out.pose), T_true))
    print(json.dumps({
        "dims": D, "voxel_size": vs, "frames": args.frames,
        "integrate_ms_per_frame": 1e3 * float(np.mean(t_int[1:])),
        "surface_occupancy": occ,
        "surface_capacity_used": int(surf.points.shape[0]),
        "extract_ms": 1e3 * t_surf,
        "raycast_ms": 1e3 * t_ray,
        "recognize_ms": 1e3 * t_match,
        "trans_err": td, "rot_err_deg": math.degrees(rd),
        "match": bool(td < 0.1 * desc.diameter and rd < math.radians(12)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
