"""Synthetic scene generation with known ground truth — the test backend.

Mirrors include/impl/scene_generation.hpp: Shoemake uniform random rotations
(:33-51), random translations (:22-28), GenerateSceneWithModel (:54-86,
transform the model about its centroid and append to the scene), and
CenterScene (:88-103). The reference uses these as its only integration-test
mechanism (SURVEY.md §4.3); here they back the automated e2e tests and
benchmarks."""

from __future__ import annotations

import math

import numpy as np


def random_rotation_quat(rng) -> np.ndarray:
    """Shoemake uniform random quaternion (w, x, y, z)
    (scene_generation.hpp:33-51; Graphics Gems III pp. 124-132)."""
    x0, x1, x2 = rng.uniform(size=3)
    th1, th2 = 2 * math.pi * x1, 2 * math.pi * x2
    r1, r2 = math.sqrt(1 - x0), math.sqrt(x0)
    # Reference float4 layout: .x is consumed as Eigen's w
    # (scene_generation.hpp:74).
    return np.array([math.sin(th1) * r1, math.cos(th1) * r1,
                     math.sin(th2) * r2, math.cos(th2) * r2], np.float32)


def quat_to_matrix(q) -> np.ndarray:
    w, x, y, z = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def blob_cloud(rng, n: int, bumps: float = 0.3):
    """A bumpy star-convex blob with outward normals — a generic non-planar
    test object (the reference uses real PLY models; this is the
    self-contained equivalent)."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    radii = 1.0 + bumps * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
    return (v * radii[:, None]).astype(np.float32), v.astype(np.float32)


def plant_model(rng, model_points, model_normals, scene_points=None,
                scene_normals=None, translation=None, quat=None):
    """Place the model into a scene at a (random) rigid pose and return
    (scene_points, scene_normals, T_true) — GenerateSceneWithModel
    (scene_generation.hpp:54-86).

    The pose is applied about the model centroid then offset by the scene
    centroid + translation, exactly like the reference:
      T = Trans(scene_centroid) · Trans(t) · Rot(q) · Trans(−model_centroid)
    """
    mp = np.asarray(model_points, np.float32)
    mn = np.asarray(model_normals, np.float32)
    if translation is None:
        translation = rng.uniform(size=3).astype(np.float32)
    if quat is None:
        quat = random_rotation_quat(rng)
    mc = mp.mean(axis=0)
    if scene_points is None:
        sc = np.zeros(3, np.float32)
        sp = np.zeros((0, 3), np.float32)
        sn = np.zeros((0, 3), np.float32)
    else:
        sp = np.asarray(scene_points, np.float32)
        sn = np.asarray(scene_normals, np.float32)
        sc = sp.mean(axis=0)

    R = quat_to_matrix(quat)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = sc + np.asarray(translation, np.float32) - R @ mc

    placed = mp @ R.T + T[:3, 3]
    placed_n = mn @ R.T
    out_p = np.concatenate([sp, placed]).astype(np.float32)
    out_n = np.concatenate([sn, placed_n]).astype(np.float32)
    return out_p, out_n, T


def clutter_cloud(rng, n: int, lo=-2.0, hi=4.0):
    """Uniform clutter points with random unit normals."""
    p = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    nr = rng.normal(size=(n, 3))
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    return p, nr.astype(np.float32)
