"""Ground-truth validation: transform distance, match criteria, truth files.

The reference's validation layer (alignment.cpp:300-335): per (scene, model)
pair, read a ground-truth 4x4 from a text file, compute ht_dist
(linalg.cu:9-20), compare against (validation_translation_threshold ·
model_diameter, validation_rotation_threshold degrees), and print a bare
0/1 match bit on stdout for scripting."""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.ops import transforms as tr


class ValidationResult(NamedTuple):
    trans_err: float
    rot_err: float          # radians
    trans_thresh: float
    rot_thresh: float       # radians
    trans_match: bool
    rot_match: bool
    match: bool


def validate_pose(pose, truth, model_diameter: float,
                  config: PPFConfig = PPFConfig()) -> ValidationResult:
    """Apply the reference match criteria (alignment.cpp:317-332).

    Caveat (shared with the reference): models with rotational symmetries
    have a family of correct poses; comparing against a single ground-truth
    matrix can reject a correct detection. Evaluate symmetric models
    against the full symmetry orbit of the truth."""
    td, rd = tr.ht_dist(np.asarray(pose, np.float32),
                        np.asarray(truth, np.float32))
    td = float(td)
    rd = float(rd)
    tt = config.validation_translation_threshold * model_diameter
    rt = math.radians(config.validation_rotation_threshold_deg)
    tm = td < tt
    rm = rd < rt
    return ValidationResult(trans_err=td, rot_err=rd, trans_thresh=tt,
                            rot_thresh=rt, trans_match=tm, rot_match=rm,
                            match=tm and rm)


def read_truth_file(path) -> np.ndarray:
    """Read a whitespace-separated 4x4 row-major matrix — the validation
    file format consumed by Eigen operator>> (util.hpp:95-104)."""
    vals = []
    with open(path) as f:
        for line in f:
            vals.extend(float(x) for x in line.split())
    if len(vals) < 16:
        raise ValueError(f"{path}: expected 16 floats, got {len(vals)}")
    return np.asarray(vals[:16], np.float32).reshape(4, 4)


def write_truth_file(path, T) -> None:
    T = np.asarray(T, np.float32)
    with open(path, "w") as f:
        for row in T:
            f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
