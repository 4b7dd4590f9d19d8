"""Registration driver: match every model against every scene.

Equivalent of ppf_registration (src/cuda/ppf.cu:29-106) — the (scene ×
model) double loop — with two deliberate improvements over the reference:

  * model descriptions are built ONCE per model and reused across scenes
    (the reference rebuilds Scene+Model per pair and flags it as a known
    inefficiency, ppf.cu:64-67);
  * device selection is JAX's; there is no per-call cudaSetDevice /
    cudaDeviceReset.

Scene PPFs are still discretized with each model's d_dist (the coupling the
reference documents at ppf.cu:64-67), so scene preprocessing runs per
(scene, model) pair.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Sequence

import numpy as np

from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import drost

log = logging.getLogger("objective_slam_tpu")


@dataclasses.dataclass
class RegistrationOutput:
    poses: list[list[np.ndarray]]          # [scene][model] -> (4,4)
    results: list[list[drost.MatchResult | tuple]]
    descriptions: list[drost.ModelDescription]


def ppf_registration(scene_clouds: Sequence[tuple[np.ndarray, np.ndarray]],
                     model_clouds: Sequence[tuple[np.ndarray, np.ndarray]],
                     model_d_dists: Sequence[float],
                     config: PPFConfig = PPFConfig(),
                     cpu_clustering: bool = False,
                     icp_clouds: Sequence[tuple[np.ndarray, np.ndarray]]
                     | None = None,
                     runs_cap: int | None = None) -> RegistrationOutput:
    """Match all models in all scenes.

    Args:
      scene_clouds: list of (points, normals) — already downsampled with
        scene_leaf_size (the CLI does this, mirroring alignment.cpp:265-275).
      model_clouds: list of (points, normals) — already downsampled to their
        d_dist (alignment.cpp:277-288).
      model_d_dists: per-model quantization steps (tau_d · diameter).
      cpu_clustering: use the greedy host clustering mode
        (--cpu_clustering, model.cu:246-266).
      icp_clouds: optional per-scene FULL-RESOLUTION (points, normals) for
        ICP refinement (the pre-downsample scans); ignored unless
        config.refine_icp.
      runs_cap: starting unique-cell compaction capacity for the
        correlation engine (drost.match runs_cap). Setting it above the
        known cell count for a batch of same-shaped scenes avoids one
        overflow-retry recompile per match.
    """
    descriptions = []
    for (mp, mn), d_dist in zip(model_clouds, model_d_dists):
        desc = drost.build_model_description(mp, mn, config, d_dist=d_dist)
        log.info("model description: %d points, d_dist=%.4f, %d keys",
                 desc.n_points, float(desc.d_dist), desc.num_keys)
        descriptions.append(desc)

    poses: list[list[np.ndarray]] = []
    results: list[list] = []
    for si, (sp, sn) in enumerate(scene_clouds):
        poses.append([])
        results.append([])
        for mi, desc in enumerate(descriptions):
            if cpu_clustering:
                pose, clusters = drost.match_greedy_cpu(desc, sp, sn, config)
                res = clusters
                T = np.asarray(pose)
            else:
                res = drost.match(
                    desc, sp, sn, config,
                    icp_points=None if icp_clouds is None
                    else icp_clouds[si][0],
                    icp_normals=None if icp_clouds is None
                    else icp_clouds[si][1],
                    runs_cap=runs_cap)
                T = np.asarray(res.pose)
                if bool(res.overflowed):
                    log.warning("scene %d model %d: vote buffer overflow",
                                si, mi)
                if bool(res.topk_saturated):
                    log.warning("scene %d model %d: top-k saturated — "
                                "threshold survivors may exceed max_poses; "
                                "raise --max_poses", si, mi)
                log.info("scene %d model %d: votes=%d winner_votes=%.1f",
                         si, mi, int(res.num_votes),
                         float(res.cluster_votes))
            log.info("Found transformation:\n%s", T)
            poses[-1].append(T)
            results[-1].append(res)
    return RegistrationOutput(poses=poses, results=results,
                              descriptions=descriptions)
