"""TSDF volume fusion + streaming object recognition.

The reference README frames the project as a KinFu/SLAM++ mapping system but
contains no TSDF code (SURVEY.md §0); BASELINE.json lists "streaming RGB-D:
KinFu-style TSDF fusion + continuous object recognition" as a target config.
This module provides that capability TPU-natively:

  * `TSDFVolume` — a dense truncated-signed-distance voxel grid (static
    shape, jit-friendly pytree);
  * `integrate` — fuse a point cloud (with normals) by splatting signed
    distances along each point's normal into the truncation band
    (point-based TSDF update; weighted running average per voxel, the
    standard KinFu update rule);
  * `extract_surface` — zero-crossing voxels back to a point cloud with
    central-difference gradient normals (static capacity + validity mask);
  * `StreamingRecognizer` — fuse frames as they arrive and re-run Drost
    matching against the fused surface.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import drost


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["tsdf", "weight", "origin"],
                   meta_fields=["dims", "voxel_size", "truncation"])
@dataclasses.dataclass(frozen=True)
class TSDFVolume:
    tsdf: jax.Array        # (D, H, W) float32, truncated signed distance
    weight: jax.Array      # (D, H, W) float32 integration weights
    origin: jax.Array      # (3,) float32 world position of voxel (0,0,0)
    dims: tuple            # static (D, H, W)
    voxel_size: float
    truncation: float


def make_volume(origin, dims, voxel_size, truncation=None) -> TSDFVolume:
    if truncation is None:
        truncation = 3.0 * voxel_size
    D, H, W = dims
    return TSDFVolume(
        tsdf=jnp.ones((D, H, W), jnp.float32),
        weight=jnp.zeros((D, H, W), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        dims=(D, H, W), voxel_size=float(voxel_size),
        truncation=float(truncation))


@functools.partial(jax.jit, static_argnames=("n_band",))
def integrate(volume: TSDFVolume, points, normals, n_band: int = 7
              ) -> TSDFVolume:
    """Fuse a frame: each point splats signed distances t ∈ [−τ, τ] at
    n_band samples along its normal (sensor-facing side positive), with the
    weighted running-average voxel update w·v ← w·v + 1·t."""
    p = jnp.asarray(points, jnp.float32)
    nr = jnp.asarray(normals, jnp.float32)
    nr = nr / jnp.maximum(jnp.linalg.norm(nr, axis=1, keepdims=True), 1e-9)
    D, H, W = volume.dims
    tau = jnp.float32(volume.truncation)
    ts = jnp.linspace(-1.0, 1.0, n_band).astype(jnp.float32) * tau  # (B,)

    # Sample positions: (n, B, 3); sdf value at sample = +t toward outside.
    samples = p[:, None, :] + nr[:, None, :] * ts[None, :, None]
    ijk = jnp.floor((samples - volume.origin) / volume.voxel_size) \
        .astype(jnp.int32)                                   # (n, B, 3)
    inside = ((ijk[..., 0] >= 0) & (ijk[..., 0] < D) &
              (ijk[..., 1] >= 0) & (ijk[..., 1] < H) &
              (ijk[..., 2] >= 0) & (ijk[..., 2] < W))
    flat = (ijk[..., 0] * H + ijk[..., 1]) * W + ijk[..., 2]
    flat = jnp.where(inside, flat, D * H * W)                # drop outside
    vals = jnp.broadcast_to(ts[None, :], flat.shape)

    sdf_sum = jnp.zeros((D * H * W,), jnp.float32) \
        .at[flat.reshape(-1)].add(jnp.where(inside, vals, 0.0).reshape(-1),
                                  mode="drop")
    w_sum = jnp.zeros((D * H * W,), jnp.float32) \
        .at[flat.reshape(-1)].add(inside.reshape(-1).astype(jnp.float32),
                                  mode="drop")
    sdf_sum = sdf_sum.reshape(D, H, W)
    w_sum = w_sum.reshape(D, H, W)

    new_w = volume.weight + w_sum
    old_contrib = jnp.where(volume.weight > 0, volume.tsdf * volume.weight,
                            0.0)
    new_tsdf = jnp.where(new_w > 0, (old_contrib + sdf_sum) /
                         jnp.maximum(new_w, 1e-9), volume.tsdf)
    new_tsdf = jnp.clip(new_tsdf, -tau, tau)
    return dataclasses.replace(volume, tsdf=new_tsdf, weight=new_w)


class Surface(NamedTuple):
    points: jax.Array      # (capacity, 3) voxel centers near the surface
    normals: jax.Array     # (capacity, 3) TSDF gradient normals
    valid: jax.Array       # (capacity,) bool
    count: jax.Array       # () int32


@functools.partial(jax.jit, static_argnames=("capacity", "normal_k"))
def extract_surface(volume: TSDFVolume, capacity: int = 4096,
                    iso_band: float = 0.5, normal_k: int = 12) -> Surface:
    """Surface voxels = observed cells whose |tsdf| < iso_band·voxel_size.

    Normals: k-NN PCA over the extracted points (robust against the holes a
    point-splat TSDF leaves in unobserved cells), oriented by the sign of
    the central-difference TSDF gradient (KinFu's normal direction).
    Returns a static-capacity cloud (top-|tsdf|-smallest if over capacity)
    ready for the matcher — padding rows are pushed far away so they can
    never vote."""
    D, H, W = volume.dims
    t = volume.tsdf
    near = (jnp.abs(t) < iso_band * volume.voxel_size) & (volume.weight > 0)

    gx = jnp.gradient(t, axis=0)
    gy = jnp.gradient(t, axis=1)
    gz = jnp.gradient(t, axis=2)
    g = jnp.stack([gx, gy, gz], axis=-1)
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normals = g / jnp.maximum(gn, 1e-9)

    score = jnp.where(near, -jnp.abs(t), -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(score, capacity)
    valid = jnp.isfinite(vals)
    i = idx // (H * W)
    j = (idx // W) % H
    k = idx % W
    centers = (jnp.stack([i, j, k], axis=-1).astype(jnp.float32) + 0.5) \
        * volume.voxel_size + volume.origin
    far = volume.origin - 1.0e7
    pts = jnp.where(valid[:, None], centers, far)
    grad_n = jnp.where(valid[:, None], normals.reshape(-1, 3)[idx], 0.0)

    from objective_slam_tpu.utils import pointcloud as _pc
    knn_n = _pc.estimate_normals_knn(pts, k=normal_k)
    flip = jnp.sum(knn_n * grad_n, axis=-1) < 0
    nrm = jnp.where(valid[:, None],
                    jnp.where(flip[:, None], -knn_n, knn_n), 0.0)
    return Surface(points=pts, normals=nrm, valid=valid,
                   count=jnp.sum(valid.astype(jnp.int32)))


class StreamingRecognizer:
    """Continuous recognition over a stream of frames: integrate each frame
    into the TSDF, then match registered model descriptions against the
    fused surface on demand — the 'streaming RGB-D' capability
    (BASELINE.json config 5)."""

    def __init__(self, volume: TSDFVolume, config: PPFConfig = PPFConfig(),
                 surface_capacity: int = 4096):
        self.volume = volume
        self.config = config
        self.surface_capacity = surface_capacity
        self.models: dict[str, drost.ModelDescription] = {}
        self.frames = 0

    def register_model(self, name: str, desc: drost.ModelDescription):
        self.models[name] = desc

    def integrate_frame(self, points, normals) -> None:
        self.volume = integrate(self.volume, points, normals)
        self.frames += 1

    def surface(self) -> Surface:
        return extract_surface(self.volume, self.surface_capacity)

    def recognize(self, names=None) -> dict[str, drost.MatchResult]:
        surf = self.surface()
        out = {}
        for name in (names or self.models):
            out[name] = drost.match(self.models[name], surf.points,
                                    surf.normals, self.config)
        return out
