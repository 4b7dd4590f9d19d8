"""Tests for the standalone tools (voxel_grid CLI, UWA analysis)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import voxel_grid  # noqa: E402
import analyze_uwa  # noqa: E402

from objective_slam_tpu.utils import ply, synthetic  # noqa: E402


def test_voxel_grid_cli(tmp_path, rng):
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    inp = tmp_path / "in.ply"
    outp = tmp_path / "out.ply"
    ply.write_ply(inp, pts, nrm)
    rc = voxel_grid.main([str(inp), str(outp), "--leaf", "0.2"])
    assert rc == 0
    cloud = ply.read_ply(outp)
    assert 0 < cloud.points.shape[0] < 500
    assert cloud.normals is not None


def test_analyze_uwa(tmp_path):
    # Synthetic occlusion.txt + two run dirs in the CLI's log format.
    occ = tmp_path / "occlusion.txt"
    occ.write_text("scene model occlusion\n"
                   "1 chef 60.0\n"
                   "1 trex 70.0\n"
                   "2 chef 85.0\n")
    run = tmp_path / "run_a"
    run.mkdir()
    (run / "rs1_0.log").write_text(
        "[ts]: Transformations for chef_model.ply in rs1.ply:\n"
        "[ts]: Distance (trans, rot): 5.0, 0.05\n"
        "[ts]: Transformations for T-rex_model.ply in rs1.ply:\n"
        "[ts]: Distance (trans, rot): 50.0, 1.5\n")
    (run / "rs2_0.log").write_text(
        "[ts]: Transformations for cheff_model.ply in rs2.ply:\n"
        "[ts]: Distance (trans, rot): 10.0, 0.1\n")

    data = analyze_uwa.read_occlusion_txt(occ)
    analyze_uwa.read_run_dir(data, run)
    occl, nd, rot, match = analyze_uwa.analyze(data)
    assert len(nd) == 3
    # chef scene1: 5/136.6 within 0.3 and 0.05 < 12deg -> match
    assert match[0]
    # trex: 50/98.8 > 0.3 or rot 1.5 > 12deg -> no match
    assert not match[1]
    assert match[2]
    rc = analyze_uwa.main([str(occ), str(run)])
    assert rc == 0


def test_merge_eval_dedup_and_protocol(tmp_path):
    import json
    import merge_eval

    base = {"model_points": 259, "diameter": 2.7, "seeds": 6,
            "n_total": 8000}
    r = lambda noise, occ, seed, eng, match: {  # noqa: E731
        "noise": noise, "occ": occ, "seed": seed, "engine": eng,
        "trans_err": 0.01, "rot_err_deg": 1.0, "match": match,
        "overflowed": False}
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({**base, "results": [
        r(0.0, 0.0, 0, "fast", False), r(0.0, 0.0, 1, "fast", True)]}))
    # b re-runs (0.0, 0.0, 0) — the re-run supersedes — and adds a new cell.
    b.write_text(json.dumps({**base, "results": [
        r(0.0, 0.0, 0, "fast", True), r(0.5, 0.0, 0, "fast", True)]}))

    merged = merge_eval.merge([str(a), str(b)])
    key = {(x["noise"], x["occ"], x["seed"]): x["match"]
           for x in merged["results"]}
    assert len(merged["results"]) == 3
    assert key[(0.0, 0.0, 0)] is True  # last wins

    c = tmp_path / "c.json"
    c.write_text(json.dumps({**base, "seeds": 30, "results": []}))
    import pytest
    with pytest.raises(SystemExit):
        merge_eval.merge([str(a), str(c)])


def test_bench_tally_gate_and_sized_runner_wiring(rng):
    """Toy-scale CPU run of bench.py's two module-level helpers — the
    on-device tally bit-equality gate and the sized-match runner. These
    shipped BROKEN in round 4 (commit 0f270d6 swapped cast_votes' last two
    args inside a bench-main closure; the suite could not reach it and
    BENCH_r04 crashed). The helpers are now module-level so this test
    traces the exact wiring the TPU bench runs; the round-4 bug fails here
    at trace time."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    import objective_slam_tpu as ost
    from objective_slam_tpu.config import PPFConfig
    from objective_slam_tpu.models import drost
    from objective_slam_tpu.ops import ppf as ppf_ops
    from objective_slam_tpu.ops import voting_block
    from objective_slam_tpu.utils import pointcloud as pc

    mp_raw, mn_raw = synthetic.blob_cloud(rng, 1200)
    sp, sn, _T = synthetic.plant_model(rng, mp_raw[::3], mn_raw[::3])
    cfg = PPFConfig(engine="correlation", ref_point_df=10, max_poses=64,
                    refine_icp=False)
    d_dist = cfg.tau_d * pc.bbox_diameter(mp_raw)
    mp, mn = pc.voxel_downsample_np(mp_raw, mn_raw, d_dist)
    desc = ost.build_model_description(mp, mn, cfg, d_dist=d_dist)
    assert desc.fast_tables.block is not None

    capacity = 512
    vox = pc.voxel_downsample(sp, sn, d_dist, capacity=capacity)
    assert not bool(vox.dropped)
    from objective_slam_tpu.ops import voting_fast
    total, rows, segs = drost._count_votes(
        desc, vox.points, vox.normals, cfg.ref_point_df, cfg.d_angle)
    n_ref = (capacity + cfg.ref_point_df - 1) // cfg.ref_point_df
    cap = drost._next_cap((rows + voting_block.CHUNK_ROWS * n_ref) * 128)
    seg_cap = drost._next_cap(max(segs, 1024))
    cap_fast = drost._next_cap(total + voting_fast.TALLY_CHUNK * n_ref)
    cap_ref_gate = drost._next_cap(total)
    ref_idx = jnp.arange(0, capacity, cfg.ref_point_df, dtype=jnp.int32)
    keys, alpha = ppf_ops.pairwise_ppf_keys(
        vox.points, vox.normals, desc.d_dist, cfg.d_angle,
        desc.max_dist_bin, ref_indices=ref_idx)

    eq_bf, eq_votes, ref_flips, gate_ovf = bench.tally_bitequal_check(
        keys, alpha, desc, cfg.d_angle, cap, seg_cap, cap_fast,
        cap_ref_gate)
    assert not bool(gate_ovf)
    # Block vs fast: same fixed-point α, disjoint tally paths — exact.
    assert bool(eq_bf) and bool(eq_votes)
    # Block vs the float32 readable engine: α-bin boundary flips only, at
    # the fixed-point quantization rate (~1e-5/vote; see bench docstring).
    # This cloud (planted exact model copy) reliably produces a few at
    # ~2M votes — which is exactly why asserting zero here would be wrong.
    assert int(ref_flips) / total < 1e-4

    # Sized-runner wiring: drost.match via the single cached vox jit.
    cfg_fast = PPFConfig(engine="fast", ref_point_df=10, max_poses=64,
                         refine_icp=False)
    vox_jit = jax.jit(lambda p, n: pc.voxel_downsample(
        p, n, d_dist, capacity=capacity))
    run_sized = bench.make_sized_runner(desc, cfg_fast, vox_jit)
    res = run_sized(jnp.asarray(sp), jnp.asarray(sn))
    assert res.pose.shape == (4, 4)
    assert not bool(res.overflowed)


def test_tpu_queue_runner(tmp_path):
    """One-process tool queue (tools/tpu_queue.py): stages run in order,
    stdout lands in the per-stage capture file, and a failing stage is
    counted without stopping the queue."""
    import tpu_queue

    (tmp_path / "q_stage_ok.py").write_text(
        "def main(argv=None):\n"
        "    print('OK', argv)\n"
        "    return 0\n")
    sys.path.insert(0, str(tmp_path))
    try:
        fails = tpu_queue.run_queue([
            {"tool": "q_stage_ok", "argv": ["--x"],
             "stdout": str(tmp_path / "o.txt")},
            {"tool": "q_stage_definitely_missing"},
        ])
    finally:
        sys.path.remove(str(tmp_path))
    assert fails == 1
    assert (tmp_path / "o.txt").read_text().startswith("OK")
