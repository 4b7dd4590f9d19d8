"""NumPy golden reference implementing the MATLAB/CUDA semantics.

A slow, direct transliteration of the reference prototype
(matlab/point_pair_feature.m, my_discretize.m, trans_model_scene.m,
model_description.m, voting_scheme.m and the CUDA voting path
src/cuda/kernel.cu / model.cu). The reference repo has no automated tests
(SURVEY.md §4); this module is the runnable spec the JAX implementation is
golden-tested against on small inputs.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32


def rotx(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], F32)


def roty(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], F32)


def rotz(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], F32)


def trans(v):
    T = np.eye(4, dtype=F32)
    T[:3, 3] = v
    return T


def invht(T):
    out = np.eye(4, dtype=F32)
    R = T[:3, :3]
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ T[:3, 3]
    return out


def point_pair_feature(p1, n1, p2, n2):
    """matlab/point_pair_feature.m:1-11 (fp64 here; tolerance covers fp32)."""
    d = np.asarray(p2, float) - np.asarray(p1, float)
    nd = np.linalg.norm(d)
    n1 = np.asarray(n1, float)
    n2 = np.asarray(n2, float)
    f1 = nd
    f2 = math.acos(np.clip(np.dot(n1, d) / (np.linalg.norm(n1) * nd), -1, 1))
    f3 = math.acos(np.clip(np.dot(n2, d) / (np.linalg.norm(n2) * nd), -1, 1))
    f4 = math.acos(np.clip(np.dot(n1, n2) /
                           (np.linalg.norm(n1) * np.linalg.norm(n2)), -1, 1))
    return np.array([f1, f2, f3, f4])


def my_discretize(F, d_dist, d_angle):
    """matlab/my_discretize.m:1-9 / kernel.cu quant_downf."""
    out = np.array(F, float)
    out[0] = F[0] - math.fmod(F[0], d_dist)
    for i in (1, 2, 3):
        out[i] = F[i] - math.fmod(F[i], d_angle)
    return out


def trans_model_scene(m_r, n_r_m, m_i, s_r, n_r_s, s_i):
    """matlab/trans_model_scene.m:1-41."""
    def canonical(p, n):
        transm = trans(-np.asarray(p, float))
        rot_y = roty(math.atan2(n[2], n[0]))
        n_tmp = rot_y @ np.array([n[0], n[1], n[2], 1.0])
        rot_z = rotz(-math.atan2(n_tmp[1], n_tmp[0]))
        return rot_z @ rot_y @ transm

    T_m_g = canonical(m_r, n_r_m)
    T_s_g = canonical(s_r, n_r_s)
    u = (T_m_g @ np.array([m_i[0], m_i[1], m_i[2], 1.0]))[:3]
    v = (T_s_g @ np.array([s_i[0], s_i[1], s_i[2], 1.0]))[:3]
    u[0] = 0.0
    v[0] = 0.0
    cross_x = u[1] * v[2] - u[2] * v[1]
    alpha = math.atan2(cross_x, float(np.dot(u, v)))
    return T_m_g, T_s_g, alpha


def alpha_index(alpha, d_angle):
    """kernel.cu:341-342: quant_downf(α+π, Δ) then lrint(α/Δ)."""
    q = (alpha + math.pi) - math.fmod(alpha + math.pi, d_angle)
    return int(round(q / d_angle))


def feature_key(F_disc, d_dist, d_angle):
    """Injective key = rounded bin tuple of the quantized feature (stands in
    for the reference's SHA-1/FNV hash of the quantized values)."""
    return (int(round(F_disc[0] / d_dist)),
            int(round(F_disc[1] / d_angle)),
            int(round(F_disc[2] / d_angle)),
            int(round(F_disc[3] / d_angle)))


def model_description(points, normals, d_dist, d_angle):
    """matlab/model_description.m:1-70 — dict key -> list of ordered pairs."""
    n = len(points)
    table = {}
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            F = point_pair_feature(points[i], normals[i], points[j], normals[j])
            key = feature_key(my_discretize(F, d_dist, d_angle), d_dist, d_angle)
            table.setdefault(key, []).append((i, j))
    return table


def voting(model_points, model_normals, scene_points, scene_normals,
           d_dist, d_angle, skip=1):
    """Dense Hough accumulator (matlab/voting_scheme.m:20-90 with the CUDA
    α-binning of kernel.cu:341-342). Returns accumulator of shape
    (n_scene_ref, n_model, n_angle+1) indexed by the *global* scene ref index
    // skip."""
    n_angle = int(round(2 * math.pi / d_angle))
    table = model_description(model_points, model_normals, d_dist, d_angle)
    n_s = len(scene_points)
    ref_ids = list(range(0, n_s, skip))
    acc = np.zeros((len(ref_ids), len(model_points), n_angle + 1), np.int64)
    for ri, r in enumerate(ref_ids):
        for i in range(n_s):
            if i == r:
                continue
            F = point_pair_feature(scene_points[r], scene_normals[r],
                                   scene_points[i], scene_normals[i])
            key = feature_key(my_discretize(F, d_dist, d_angle), d_dist, d_angle)
            for (mr, mi) in table.get(key, ()):
                _, _, alpha = trans_model_scene(
                    model_points[mr], model_normals[mr], model_points[mi],
                    scene_points[r], scene_normals[r], scene_points[i])
                acc[ri, mr, alpha_index(alpha, d_angle)] += 1
    return acc


def fnv1a_bytes(data: bytes) -> int:
    """Reference FNV-1a (kernel.cu:23-30)."""
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
