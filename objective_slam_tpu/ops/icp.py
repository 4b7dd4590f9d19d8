"""ICP pose refinement — point-to-point, MXU-native.

Not present in the reference (its pipeline ends at the clustered Hough
winner, model.cu:293-295); listed as a rebuild extension in BASELINE.json
("pose clustering plus ICP refinement run as batched Procrustes/SVD solves
on the MXU"). Refines the Drost pose — whose rotation error is bounded by
the 2π/30 α quantization (~±6°) — down to the noise floor.

Design: fixed-iteration lax.fori loop (static shapes); nearest neighbours
via the ‖a−b‖² = ‖a‖²+‖b‖²−2a·b distance matrix on the MXU; correspondence
rejection by distance threshold; weighted Procrustes (Kabsch) via a 3×3 SVD
per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class ICPResult(NamedTuple):
    pose: jax.Array        # (4, 4) refined transform (model -> scene)
    rms: jax.Array         # () float32 final inlier RMS distance
    inliers: jax.Array     # () int32 final inlier count


def refine_pose(model_points, scene_points, init_pose, *,
                iterations: int = 12, max_dist: float,
                scene_valid=None) -> ICPResult:
    """Refine `init_pose` so that model_points @ Rᵀ + t aligns with
    scene_points.

    Args:
      model_points: (n_m, 3) float32.
      scene_points: (n_s, 3) float32 (padded rows allowed via scene_valid).
      init_pose: (4, 4) initial model->scene transform.
      iterations: fixed ICP iteration count (static).
      max_dist: correspondence rejection radius (typically ~2·d_dist).
      scene_valid: optional (n_s,) bool mask of real scene points.
    """
    m = jnp.asarray(model_points, jnp.float32)
    s = jnp.asarray(scene_points, jnp.float32)
    T0 = jnp.asarray(init_pose, jnp.float32)
    if scene_valid is None:
        scene_valid = jnp.ones((s.shape[0],), bool)
    s_sq = jnp.sum(s * s, axis=1)
    s_sq = jnp.where(scene_valid, s_sq, jnp.inf)
    max_sq = jnp.float32(max_dist) ** 2

    def step(_, carry):
        T, _, _ = carry
        mt = m @ T[:3, :3].T + T[:3, 3]                     # (n_m, 3)
        d2 = (jnp.sum(mt * mt, axis=1)[:, None] + s_sq[None, :]
              - 2.0 * jnp.dot(mt, s.T, precision=_HI))      # (n_m, n_s) MXU
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
        w = (nn_d2 < max_sq).astype(jnp.float32)
        tgt = s[nn]                                          # (n_m, 3)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        cm = jnp.sum(w[:, None] * mt, axis=0) / wsum
        cs = jnp.sum(w[:, None] * tgt, axis=0) / wsum
        H = jnp.einsum("ni,nj->ij", w[:, None] * (mt - cm), tgt - cs,
                       precision=_HI)
        U, _, Vt = jnp.linalg.svd(H)
        det = jnp.linalg.det(Vt.T @ U.T)
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(
            det)
        R = Vt.T @ D @ U.T
        t = cs - R @ cm
        dT = jnp.zeros((4, 4), jnp.float32)
        dT = dT.at[:3, :3].set(R).at[:3, 3].set(t).at[3, 3].set(1.0)
        T_new = dT @ T
        rms = jnp.sqrt(jnp.sum(w * nn_d2) / wsum)
        return (T_new, rms, jnp.sum(w).astype(jnp.int32))

    init = (T0, jnp.float32(0.0), jnp.int32(0))
    T, rms, inl = jax.lax.fori_loop(0, iterations, step, init)
    return ICPResult(pose=T, rms=rms, inliers=inl)
