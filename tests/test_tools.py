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
