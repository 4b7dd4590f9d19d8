"""End-to-end dataset harness: CLI runs over a small synthetic
occlusion-style dataset -> per-scene logs -> analyze_uwa statistics.

Automates the reference's UWA benchmark workflow (alignment CLI runs +
analyze_mian.py, SURVEY.md §3.5) on generated data."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import analyze_uwa  # noqa: E402

from objective_slam_tpu import cli  # noqa: E402
from objective_slam_tpu.utils import (ply, pointcloud as pc, synthetic,  # noqa: E402
                                      validation)


def test_cli_runs_feed_analysis(tmp_path, rng, capsys):
    # "chicken" stands in for a UWA model (diameter constant exists).
    mp, mn = synthetic.blob_cloud(rng, 80)
    scale = analyze_uwa.MODEL_DIAMS["chicken"] / 2.6  # stretch to UWA size
    mp = (mp * scale).astype(np.float32)
    model_path = tmp_path / "chicken_model.ply"
    ply.write_ply(model_path, mp, mn)

    occl_lines = ["scene model occlusion"]
    run_dir = tmp_path / "run1"
    run_dir.mkdir()
    for scene_num, occl in [(1, 55.0), (2, 70.0)]:
        sp, sn, T_true = synthetic.plant_model(rng, mp, mn)
        scene_path = tmp_path / f"rs{scene_num}.ply"
        truth_path = tmp_path / f"rs{scene_num}_truth.txt"
        ply.write_ply(scene_path, sp, sn)
        validation.write_truth_file(truth_path, T_true)
        occl_lines.append(f"{scene_num} chicken {occl}")

        rc = cli.main([
            "--scene_files", str(scene_path),
            "--model_files", str(model_path),
            "--tau_d", "0.1",
            "--scene_leaf_size", str(0.05 * scale),
            "--validation_files", str(truth_path),
            "--logfile", str(run_dir / f"rs{scene_num}_0.log"),
        ])
        assert rc == 0
        assert capsys.readouterr().out.strip() == "1"

    occl_path = tmp_path / "occlusion.txt"
    occl_path.write_text("\n".join(occl_lines) + "\n")

    data = analyze_uwa.read_occlusion_txt(occl_path)
    analyze_uwa.read_run_dir(data, run_dir)
    occl, nd, rot, match = analyze_uwa.analyze(data)
    assert len(nd) == 2
    assert match.all(), (nd, rot)
    assert analyze_uwa.main([str(occl_path), str(run_dir)]) == 0


def test_mesh_partial_view_workflow(tmp_path, rng, capsys):
    """The reference's real UWA workflow shape: a triangle-MESH model
    (normals from the mesh, compute_normals.m path), partial-view scenes
    from z-buffer self-occlusion culling at different viewpoints, clutter,
    CLI validation, analyze_uwa occlusion statistics (VERDICT r1 next #8)."""
    verts, faces = synthetic.bumpy_mesh(subdiv=3)          # 642 verts, closed
    scale = analyze_uwa.MODEL_DIAMS["chef"] / pc.bbox_diameter(verts)
    verts = (verts * scale).astype(np.float32)
    nrm = pc.mesh_vertex_normals(verts, faces)

    model_path = tmp_path / "chef_model.ply"
    ply.write_ply(model_path, verts, nrm, faces=faces)     # normals from mesh

    occl_lines = ["scene model occlusion"]
    run_dir = tmp_path / "run1"
    run_dir.mkdir()
    for scene_num, vp in [(1, (6.0, 0.0, 1.0)), (2, (0.0, -6.0, -2.0))]:
        visible = synthetic.partial_view(verts, nrm, np.asarray(vp) * scale)
        occl = 100.0 * (1.0 - visible.mean())
        assert 20.0 < occl < 80.0                          # genuinely partial
        mp_vis, mn_vis = verts[visible], nrm[visible]

        # Planar clutter patch at model scale.
        u = rng.uniform(-1.2, 1.2, size=(400, 2)) * scale
        cp = np.concatenate([u, rng.normal(scale=0.005 * scale,
                                           size=(400, 1))], axis=1)
        cp = (cp + np.float32([2.5 * scale, 0, 0])).astype(np.float32)
        cn = np.tile(np.float32([0, 0, 1]), (400, 1))
        sp, sn, T_true = synthetic.plant_model(rng, mp_vis, mn_vis, cp, cn)

        scene_path = tmp_path / f"rs{scene_num}.ply"
        truth_path = tmp_path / f"rs{scene_num}_truth.txt"
        ply.write_ply(scene_path, sp, sn)
        validation.write_truth_file(truth_path, T_true)
        occl_lines.append(f"{scene_num} chef {occl:.1f}")

        rc = cli.main([
            "--scene_files", str(scene_path),
            "--model_files", str(model_path),
            "--tau_d", "0.1",
            "--scene_leaf_size", str(0.04 * scale),
            "--ref_point_df", "2",
            # Partial views leave the Hough pose coarse (few visible model
            # points); ICP with a tight rejection radius (occluded model
            # points must not latch onto clutter) recovers the margin.
            "--icp_iterations", "12",
            "--icp_max_dist_factor", "1.0",
            "--validation_files", str(truth_path),
            "--logfile", str(run_dir / f"rs{scene_num}_0.log"),
        ])
        assert rc == 0
        assert capsys.readouterr().out.strip() == "1"

    occl_path = tmp_path / "occlusion.txt"
    occl_path.write_text("\n".join(occl_lines) + "\n")
    data = analyze_uwa.read_occlusion_txt(occl_path)
    analyze_uwa.read_run_dir(data, run_dir)
    occl_a, nd, rot, match = analyze_uwa.analyze(data)
    assert len(nd) == 2 and match.all(), (nd, rot)


def test_scene_log_bits_resume_gate(tmp_path):
    """run_uwa_analog --resume must skip only scenes whose log carries one
    Match line per model; partial logs (interrupted mid-scene) re-run."""
    import run_uwa_analog

    log = tmp_path / "rs1_0.log"
    assert run_uwa_analog.scene_log_bits(log, 2) is None   # missing

    log.write_text("[ts]: Match (trans, rot): 1, 1\n")
    assert run_uwa_analog.scene_log_bits(log, 2) is None   # partial

    log.write_text("[ts]: Match (trans, rot): 1, 1\n"
                   "noise line\n"
                   "[ts]: Match (trans, rot): 1, 0\n")
    assert run_uwa_analog.scene_log_bits(log, 2) == [1, 0]  # complete
