"""TPU-fast voting engine: gather-free expansion + MXU tally.

Why this exists: XLA's general 1D gather/scatter on TPU runs at ~110M
random accesses/s (measured; lowered element-wise), which caps the
expansion-based engine in ops/voting.py at a few Mvotes/s. The two TPU
primitives that ARE fast are
  * sublane `take_along_axis` (out[i,j] = table[idx[i,j], j]) on tables that
    fit on-chip — ~400G lookups/s measured, and
  * dense matmuls on the MXU (a one-hot histogram runs at ~8G votes/s).

This engine re-expresses the reference's vote generation
(ppf_vote_count_kernel / scan / ppf_vote_kernel, model.cu:95-146,
kernel.cu:480-554) using only those primitives plus cumsum/cummax:

  1. model-table lookups use **rotation-packed tables**: a table of K
     entries becomes (ROT·K/128, 128) where block ρ holds the table
     rotated by ρ lanes; a query with key k in lane l needs rotation
     (k−l) mod 128 and is answered in one of 128/ROT masked tga passes.
  2. per-vote segment values (pair-array base offset, bucket size) are
     transported from scene pairs to their votes with a **cumsum-of-diffs
     fill**: scatter +x at the segment head and −x one past its end, then
     cumsum — exact for integers, no gather.
  3. the owning scene pair (sp) and segment start are filled with
     scatter-max + lax.cummax (both monotonic).
  4. α_s is **recomputed per vote** from scene geometry fetched through
     fully lane-replicated small tables (n ≤ a few thousand scene points),
     with bit-identical math to the pair stage. The reference's
     ppf_vote_kernel likewise recomputes per vote (kernel.cu:536-547).
  5. the tally pads each reference row's votes to a chunk multiple so every
     chunk belongs to one row, then accumulates each chunk with a one-hot
     (C×n_m)ᵀ(C×32) matmul on the MXU and combines chunks per row with a
     cumsum + row-boundary slice — no scatter anywhere in the hot path.

Numerics match ops/voting.cast_votes exactly for integer tallies (the α
recompute uses the same fp32 formula on the same inputs).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from objective_slam_tpu.ops import ppf as ppf_ops
from objective_slam_tpu.ops import voting as voting_ref

LANES = 128
# Tally chunk: votes per one-hot MXU matmul; each reference row's votes
# are padded to a chunk multiple (cap sizing must add TALLY_CHUNK per row).
TALLY_CHUNK = 8192
# Rotation blocks per packed table: 128/ROT masked tga passes per lookup,
# table memory = ROT × base. ROT=16 -> 8 passes.
ROT = 16


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PackedTable(NamedTuple):
    """Rotation-packed lookup table for arbitrary-lane sublane gathers.

    packed[ρ·H + h, l] = flat[h·128 + (l+ρ) % 128] for ρ in [0, ROT).
    A query k in lane l is served by pass b when (k−l) mod 128 lies in
    [b·ROT, (b+1)·ROT)."""
    packed: jax.Array           # (ROT*H, LANES)
    height: int                 # H = padded_len / 128


def pack_table(flat, fill=0) -> PackedTable:
    flat = jnp.asarray(flat)
    n = flat.shape[0]
    H = _ceil_to(n, LANES) // LANES
    padded = jnp.concatenate([
        flat, jnp.full((H * LANES - n,), fill, flat.dtype)])
    grid = padded.reshape(H, LANES)
    blocks = []
    for rho in range(ROT):
        blocks.append(jnp.roll(grid, -rho, axis=1))
    return PackedTable(packed=jnp.concatenate(blocks, axis=0), height=H)


def packed_lookup(table: PackedTable, keys):
    """keys: (Q, LANES) int32 -> values (Q, LANES), 128/ROT tga passes.

    Pass b serves queries whose needed rotation ρ = (k − lane) mod 128 lies
    in [b·ROT, (b+1)·ROT): rolling the packed table's lanes by −b·ROT turns
    its stored rotations 0..ROT−1 into b·ROT..(b+1)·ROT−1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    hi = keys // LANES
    lo = keys % LANES
    rot = (lo - lane) % LANES
    out = jnp.zeros(keys.shape, table.packed.dtype)
    n_pass = LANES // ROT
    for b in range(n_pass):
        tbl = table.packed if b == 0 else jnp.roll(table.packed, -b * ROT,
                                                   axis=1)
        local = rot - b * ROT
        in_block = (local >= 0) & (local < ROT)
        row = jnp.where(in_block, local * table.height + hi, 0)
        got = jnp.take_along_axis(tbl, row, axis=0)
        out = jnp.where(in_block, got, out)
    return out


class ReplicatedTable(NamedTuple):
    """Fully lane-replicated table: every lane holds the whole flat table;
    queries from any lane in one tga. Memory = 128 × base — for small
    tables only (scene coordinates, per-row data)."""
    rep: jax.Array              # (n_pad, LANES)


def replicate_table(flat, fill=0) -> ReplicatedTable:
    flat = jnp.asarray(flat)
    n = flat.shape[0]
    n_pad = max(_ceil_to(n, 8), 8)
    padded = jnp.concatenate([
        flat, jnp.full((n_pad - n,), fill, flat.dtype)])
    return ReplicatedTable(rep=jnp.tile(padded[:, None], (1, LANES)))


def replicated_lookup(table: ReplicatedTable, idx):
    """idx: (Q, LANES) int32 -> values (Q, LANES), one tga."""
    return jnp.take_along_axis(table.rep, idx, axis=0)


class FastModelTables(NamedTuple):
    """Rotation-packed model-side tables built from a KeyTable."""
    counts: PackedTable         # int32 over key space K
    offsets: PackedTable        # int32 over key space K
    pair_mr: PackedTable        # int32 over pair slots P
    pair_alpha: PackedTable     # float32 over pair slots P


def build_fast_tables(table: voting_ref.KeyTable) -> FastModelTables:
    return FastModelTables(
        counts=pack_table(table.counts),
        offsets=pack_table(table.offsets),
        pair_mr=pack_table(table.pair_mr),
        pair_alpha=pack_table(table.pair_alpha, fill=0.0),
    )


def _as_q(x, cap):
    """Reshape a flat (cap,) array to (cap/128, 128) query layout."""
    return x.reshape(cap // LANES, LANES)


def cast_votes_fast(scene_points, scene_normals, ref_indices, ref_beta,
                    ref_gamma, scene_keys, tables: FastModelTables,
                    n_model: int, d_angle: float, vote_cap: int,
                    chunk: int = TALLY_CHUNK, use_mxu_tally: bool = True
                    ) -> voting_ref.VoteResult:
    """Generate and tally votes (fast engine).

    Args:
      scene_points/normals: (n, 3) float32 (device).
      ref_indices: (R,) int32 reference rows.
      ref_beta/ref_gamma: (R,) canonical angles of the reference points.
      scene_keys: (R, n) int32 packed PPF keys (INVALID_KEY masked).
      tables: rotation-packed model tables.
      vote_cap: static capacity; must be a multiple of 128·chunk alignment
        is handled internally. Row padding consumes up to R·chunk extra
        slots — size vote_cap accordingly.
    """
    # Internal capacity must align to both the lane width and the tally
    # chunk; round up (it is only a buffer size).
    vote_cap = _ceil_to(vote_cap, max(LANES, chunk))
    R, n = scene_keys.shape
    S = R * n
    flat_keys = scene_keys.reshape(-1)
    valid = flat_keys != ppf_ops.INVALID_KEY
    safe_keys = jnp.where(valid, flat_keys, 0)

    S_pad = _ceil_to(S, LANES)
    keys_q = _as_q(jnp.concatenate(
        [safe_keys, jnp.zeros((S_pad - S,), jnp.int32)]), S_pad)
    cnt_q = packed_lookup(tables.counts, keys_q).reshape(-1)[:S]
    off_q = packed_lookup(tables.offsets, keys_q).reshape(-1)[:S]
    cnt = jnp.where(valid, cnt_q, 0)

    # Row-aligned padding so every tally chunk maps to one reference row.
    row_tot = jnp.sum(cnt.reshape(R, n), axis=1)                # (R,)
    pad_row = (-row_tot) % chunk
    row_tot_p = row_tot + pad_row
    row_start_p = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(row_tot_p, dtype=jnp.int32)[:-1]])
    row_cum = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(row_tot, dtype=jnp.int32)[:-1]])

    voffs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(cnt, dtype=jnp.int32)[:-1]])                 # (S,)
    r_of_s = (jnp.arange(S, dtype=jnp.int32) // n)
    pad_before = row_start_p[r_of_s] - row_cum[r_of_s]
    heads = voffs + pad_before                                  # padded head
    total_p = row_start_p[-1] + row_tot_p[-1]
    total = row_cum[-1] + row_tot[-1]
    overflow = total_p > vote_cap

    nz = cnt > 0
    head_idx = jnp.where(nz, heads, vote_cap)                   # drop empties
    tail_idx = jnp.where(nz, heads + cnt, vote_cap)

    # sp and start fills (monotonic -> scatter-max + cummax).
    s_iota = jnp.arange(S, dtype=jnp.int32)
    sp = jax.lax.cummax(
        jnp.zeros((vote_cap,), jnp.int32)
        .at[head_idx].max(s_iota, mode="drop"),
        axis=0)
    start = jax.lax.cummax(
        jnp.zeros((vote_cap,), jnp.int32)
        .at[head_idx].max(head_idx, mode="drop"),
        axis=0)

    # Integer segment fills via cumsum of ±diffs at head/tail.
    def seg_fill_int(vals):
        d = jnp.zeros((vote_cap,), jnp.int32)
        d = d.at[head_idx].add(vals, mode="drop")
        d = d.at[tail_idx].add(-vals, mode="drop")
        return jnp.cumsum(d, dtype=jnp.int32)

    off_v = seg_fill_int(jnp.where(nz, off_q, 0))
    cnt_v = seg_fill_int(jnp.where(nz, cnt, 0))

    # Per-vote stage, slab-scanned to bound live memory: each slab reads its
    # slices of the four fill arrays and emits compact (m_r, a_bin, ok).
    ref_pts = scene_points[ref_indices]
    cb, sb = jnp.cos(ref_beta), jnp.sin(ref_beta)
    cg, sg = jnp.cos(ref_gamma), jnp.sin(ref_gamma)
    row1 = jnp.stack([sg * cb, cg, sg * sb], axis=-1)           # (R, 3)
    row2 = jnp.stack([-sb, jnp.zeros_like(sb), cb], axis=-1)
    p_tabs = [replicate_table(scene_points[:, c]) for c in range(3)]
    r_tabs = [replicate_table(ref_pts[:, c]) for c in range(3)]
    r1_tabs = [replicate_table(row1[:, c]) for c in range(3)]
    r2_tabs = [replicate_table(row2[:, c]) for c in range(3)]
    P_max = tables.pair_mr.height * LANES - 1

    slab = min(1 << 21, vote_cap)
    # vote_cap is a multiple of max(LANES, chunk); make it divide into slabs.
    slab = math.gcd(slab, vote_cap)
    n_slabs = vote_cap // slab

    def per_vote(args):
        sp_s, start_s, off_s, cnt_s, v0 = args
        v_iota = v0 + jnp.arange(slab, dtype=jnp.int32)
        j = v_iota - start_s
        ok = (j >= 0) & (j < cnt_s) & (v_iota < total_p)
        slot = jnp.clip(off_s + j, 0, P_max)
        slot_q = _as_q(slot, slab)
        m_r = packed_lookup(tables.pair_mr, slot_q).reshape(-1)
        a_m = packed_lookup(tables.pair_alpha, slot_q).reshape(-1)

        # Recompute α_s per vote from geometry via replicated small
        # tables — identical fp32 formula to ops.ppf.pairwise_ppf_keys.
        r_v = sp_s // n
        i_v = sp_s - r_v * n
        i_q = _as_q(i_v, slab)
        r_q = _as_q(r_v, slab)
        px = replicated_lookup(p_tabs[0], i_q)
        py = replicated_lookup(p_tabs[1], i_q)
        pz = replicated_lookup(p_tabs[2], i_q)
        dx = px - replicated_lookup(r_tabs[0], r_q)
        dy = py - replicated_lookup(r_tabs[1], r_q)
        dz = pz - replicated_lookup(r_tabs[2], r_q)
        u_y = (replicated_lookup(r1_tabs[0], r_q) * dx +
               replicated_lookup(r1_tabs[1], r_q) * dy +
               replicated_lookup(r1_tabs[2], r_q) * dz)
        u_z = (replicated_lookup(r2_tabs[0], r_q) * dx +
               replicated_lookup(r2_tabs[1], r_q) * dy +
               replicated_lookup(r2_tabs[2], r_q) * dz)
        a_s = jnp.arctan2(u_z, u_y).reshape(-1)

        # α bin exactly as kernel.cu:341-342 (same formula as ops.voting).
        two_pi = jnp.float32(2.0 * jnp.pi)
        alpha = a_s - a_m
        alpha = alpha - two_pi * jnp.floor((alpha + jnp.pi) / two_pi)
        shifted = alpha + jnp.float32(jnp.pi)
        quant = shifted - jnp.fmod(shifted, jnp.float32(d_angle))
        a_bin = jnp.clip(jnp.round(quant / jnp.float32(d_angle))
                         .astype(jnp.int32), 0, voting_ref.ALPHA_PAD - 1)
        return (m_r.astype(jnp.int32), a_bin.astype(jnp.int8),
                ok, r_v)

    v_bases = jnp.arange(n_slabs, dtype=jnp.int32) * slab
    m_r, a_bin, vote_ok, r_v = jax.lax.map(
        per_vote,
        (sp.reshape(n_slabs, slab), start.reshape(n_slabs, slab),
         off_v.reshape(n_slabs, slab), cnt_v.reshape(n_slabs, slab),
         v_bases))
    m_r = m_r.reshape(-1)
    a_bin = a_bin.reshape(-1).astype(jnp.int32)
    vote_ok = vote_ok.reshape(-1)
    r_v = r_v.reshape(-1)

    A = voting_ref.ALPHA_PAD
    if use_mxu_tally:
        acc = _mxu_tally(m_r, a_bin, vote_ok, r_of_chunk_start=row_start_p,
                         R=R, n_model=n_model, chunk=chunk,
                         vote_cap=vote_cap)
    else:
        target = jnp.where(vote_ok,
                           (r_v * n_model + m_r) * A + a_bin,
                           R * n_model * A)
        acc = (jnp.zeros((R * n_model * A,), jnp.int32)
               .at[target].add(1, mode="drop").reshape(R, n_model, A))

    return voting_ref.VoteResult(accumulator=acc, num_votes=total,
                                 overflowed=overflow)


def _mxu_tally(m_r, a_bin, vote_ok, r_of_chunk_start, R, n_model, chunk,
               vote_cap):
    """Chunked one-hot matmul tally. Votes are row-padded so each chunk
    belongs to exactly one reference row; per-chunk partials combine into
    per-row tallies with a cumsum over chunks + row-boundary differences."""
    A = voting_ref.ALPHA_PAD
    n_chunks = vote_cap // chunk
    m_pad = _ceil_to(n_model, 128)

    m_c = m_r.reshape(n_chunks, chunk)
    a_c = a_bin.reshape(n_chunks, chunk)
    ok_c = vote_ok.reshape(n_chunks, chunk)

    iota_m = jax.lax.broadcasted_iota(jnp.int32, (chunk, m_pad), 1)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (chunk, A), 1)

    def chunk_partial(args):
        m, a, ok = args
        om = ((m[:, None] == iota_m) & ok[:, None]).astype(jnp.bfloat16)
        oa = (a[:, None] == iota_a).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            om, oa, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (m_pad, A)

    partials = jax.lax.map(chunk_partial, (m_c, a_c, ok_c),
                           batch_size=8)                      # (n_chunks, m_pad, A)

    # Per-row combine: rows own contiguous chunk ranges
    # [row_start_p[r]/chunk, row_start_p[r+1]/chunk).
    cum = jnp.cumsum(partials, axis=0, dtype=jnp.float32)
    cum = jnp.concatenate([jnp.zeros((1, m_pad, A), jnp.float32), cum],
                          axis=0)                               # (n_chunks+1,...)
    row_chunk_start = jnp.clip(r_of_chunk_start // chunk, 0, n_chunks)
    row_chunk_end = jnp.concatenate([
        row_chunk_start[1:],
        jnp.full((1,), n_chunks, jnp.int32)])
    row_chunk_end = jnp.clip(row_chunk_end, 0, n_chunks)
    acc = cum[row_chunk_end] - cum[row_chunk_start]             # (R, m_pad, A)
    return jnp.round(acc[:, :n_model, :]).astype(jnp.int32)
