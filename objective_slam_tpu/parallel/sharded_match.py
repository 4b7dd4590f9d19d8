"""Multi-chip PPF matching: shard the scene reference-point axis.

The reference is single-GPU (ppf.cu:37-49 picks one device; SURVEY.md §2.4).
The Hough dimension — scene reference points — is embarrassingly parallel,
so the TPU scale-out shards it across a `jax.sharding.Mesh` axis ("ref")
with `shard_map`:

  per-device:  its slice of reference rows -> pairwise keys/α -> local dense
               accumulator -> local top-K candidates + pose reconstruction
  collective:  all_gather of the K candidates per device over ICI, global
               relative threshold (max rides the same gather), dense
               clustering over the D·K union, argmax winner — replicated.

The only cross-chip traffic is D·K candidate poses (a few hundred KB), not
the O(R·n) pair arrays — the collective rides ICI once per match. Exact
w.r.t. the single-chip path whenever each shard's survivors fit in K (same
static-capacity caveat as `voting.top_votes`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import drost
from objective_slam_tpu.models.drost import ModelDescription
from objective_slam_tpu.ops import clustering, ppf as ppf_ops, transforms as tr
from objective_slam_tpu.ops import (voting, voting_block, voting_corr,
                                    voting_fast)


class ShardedMatchResult(NamedTuple):
    pose: jax.Array            # (4, 4) winner (replicated)
    cluster_votes: jax.Array   # () winner's clustered count
    num_votes: jax.Array       # () total votes across all shards
    overflowed: jax.Array      # () any shard overflowed its vote buffer
    pose_votes: jax.Array      # (D*K,) gathered raw vote counts
    pose_keep: jax.Array       # (D*K,) global-threshold survivors


def make_sharded_matcher(mesh: Mesh, model: ModelDescription,
                         config: PPFConfig, n_scene: int,
                         vote_cap_per_shard: int):
    """Build a jitted multi-chip matcher over `mesh` (axis name "ref").

    n_scene and vote_cap_per_shard are static. The number of reference rows
    R = ceil(n_scene / ref_point_df) is padded up to a multiple of the mesh
    size with out-of-range rows (they generate only INVALID_KEY pairs).
    Returns fn(scene_points, scene_normals) -> ShardedMatchResult.
    """
    n_dev = mesh.shape["ref"]
    df = config.ref_point_df
    R = (n_scene + df - 1) // df
    R_pad = ((R + n_dev - 1) // n_dev) * n_dev
    # The fast engines row-pad each local row to a tally chunk; budget it.
    # (Legacy chunk and block-engine chunk are both 8192 slots per row;
    # the block engine additionally rounds each segment to whole 128-lane
    # rows — callers should size vote_cap_per_shard from
    # drost._count_votes' row totals when exactness matters.)
    if config.engine == "fast":
        vote_cap_per_shard += (R_pad // n_dev) * voting_fast.TALLY_CHUNK
    # Padded rows index a sentinel far outside the cloud -> self-pair rule
    # can't trigger, distance overflows -> INVALID_KEY everywhere.
    ref_idx_host = np.full((R_pad,), n_scene - 1, np.int32)
    ref_idx_host[:R] = np.arange(0, R * df, df, dtype=np.int32)
    pad_row = np.zeros((R_pad,), bool)
    pad_row[R:] = True

    K = config.max_poses

    def _local_candidates(ref_idx, pad_mask, scene_points, scene_normals,
                          mdl: ModelDescription):
        """Per-shard: vote + local top-K + pose build. Runs under shard_map
        with ref_idx/pad_mask sharded, everything else replicated."""
        keys, alpha_s = drost._scene_keys(mdl, scene_points, scene_normals,
                                          ref_idx, config.d_angle)
        keys = jnp.where(pad_mask[:, None], ppf_ops.INVALID_KEY, keys)
        if config.engine == "correlation":
            if mdl.corr_tables is None:
                raise ValueError("engine='correlation' but corr_tables is "
                                 "None — rebuild tables for this engine")
            votes = voting_corr.cast_votes_corr(keys, alpha_s,
                                                mdl.corr_tables,
                                                mdl.n_points)
        elif config.engine == "fast":
            if mdl.fast_tables is None:
                raise ValueError("engine='fast' but fast_tables is None — "
                                 "rebuild tables for this engine")
            if mdl.fast_tables.block is not None:
                votes = voting_block.cast_votes_block(
                    keys, alpha_s, mdl.fast_tables.block, mdl.n_points,
                    config.d_angle, vote_cap_per_shard)
            else:
                votes = voting_fast.cast_votes_fast(
                    keys, alpha_s, mdl.fast_tables, mdl.n_points,
                    config.d_angle, vote_cap_per_shard)
        else:
            votes = voting.cast_votes(keys, alpha_s, mdl.table,
                                      mdl.n_points, config.d_angle,
                                      vote_cap_per_shard)
        acc = votes.accumulator
        Rl, n_m, A = acc.shape
        counts, idx = jax.lax.top_k(acc.reshape(-1), K)
        a_idx = (idx % A).astype(jnp.int32)
        m_idx = ((idx // A) % n_m).astype(jnp.int32)
        r_loc = (idx // (A * n_m)).astype(jnp.int32)

        s_pts = scene_points[ref_idx]          # (Rl, 3)
        s_nrm = scene_normals[ref_idx]
        s_beta, s_gamma = tr.canonical_angles(s_pts, s_nrm)
        poses = tr.pose_from_vote(
            a_idx, mdl.points[m_idx], mdl.beta[m_idx], mdl.gamma[m_idx],
            s_pts[r_loc], s_beta[r_loc], s_gamma[r_loc], config.d_angle)
        weighted = counts.astype(jnp.float32) * mdl.vote_weights[m_idx]
        return counts, poses, weighted, votes.num_votes, votes.overflowed

    def _body(ref_idx, pad_mask, scene_points, scene_normals, mdl):
        counts, poses, weighted, nv, ovf = _local_candidates(
            ref_idx, pad_mask, scene_points, scene_normals, mdl)
        # Gather the candidate sets over ICI; every chip then runs the
        # (cheap) global phase replicated — no further communication.
        g_counts = jax.lax.all_gather(counts, "ref").reshape(-1)     # (D*K,)
        g_poses = jax.lax.all_gather(poses, "ref").reshape(-1, 4, 4)
        g_weighted = jax.lax.all_gather(weighted, "ref").reshape(-1)
        total_votes = jax.lax.psum(nv, "ref")
        any_ovf = jax.lax.psum(ovf.astype(jnp.int32), "ref") > 0

        max_count = jnp.max(g_counts)
        thresh = jnp.float32(config.vote_count_threshold) * \
            max_count.astype(jnp.float32)
        keep = (g_counts.astype(jnp.float32) > thresh) & (g_counts > 0)

        t = g_poses[:, :3, 3]
        q = tr.hrotmat2quat(g_poses)
        cl = clustering.cluster_poses_dense(
            t, q, g_weighted, keep, mdl.d_dist, config.rot_thresh,
            include_center_cell=config.cluster_center_cell,
            use_l1_norm=config.use_l1_norm,
            use_averaged_clusters=config.use_averaged_clusters)
        win = jnp.argmax(cl.vote_counts)
        pose = g_poses[win].at[:3, 3].set(cl.translations[win])
        return (pose, cl.vote_counts[win], total_votes, any_ovf,
                g_counts, keep)

    mdl_specs = jax.tree.map(lambda _: P(), model)
    sharded = jax.shard_map(
        _body, mesh=mesh,
        in_specs=(P("ref"), P("ref"), P(), P(), mdl_specs),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False)

    ref_sharding = NamedSharding(mesh, P("ref"))
    rep_sharding = NamedSharding(mesh, P())
    ref_idx_dev = jax.device_put(jnp.asarray(ref_idx_host), ref_sharding)
    pad_dev = jax.device_put(jnp.asarray(pad_row), ref_sharding)

    @jax.jit
    def matcher(scene_points, scene_normals):
        out = sharded(ref_idx_dev, pad_dev,
                      jnp.asarray(scene_points, jnp.float32),
                      jnp.asarray(scene_normals, jnp.float32), model)
        return ShardedMatchResult(*out)

    return matcher
