"""Correlation voting engine — matmul-only Hough voting (approximate α).

The exact engines pay ~10 ns per vote for one indexed lookup (the measured
floor for ANY indexed access on this TPU). This engine removes per-vote
work entirely by factoring the accumulator through the key space:

  acc[r, m, a] = Σ_k Σ_b  S3[r, k, b] · M3[k, (b − a + n/2) mod n, m]

where S3 histograms scene pairs per (reference row, occupied model key,
coarse α_s bin) — ONE scatter-add over scene pairs — and M3 histograms the
model description per (key, coarse α_m bin, model point) at build time.
The contraction is a batch of n_angle dense matmuls on the MXU whose cost
scales with R·K_occ·n_angle·n_m, INDEPENDENT of the vote count — the right
asymptotics for vote-heavy scenes.

Approximation: the vote's α bin is computed from coarse-binned α_s and α_m
(bin(α_s)−bin(α_m) instead of bin(α_s−α_m)), which moves votes whose α
fraction straddles a bin edge by at most ±1 α bin (≈ uniformly-distributed
half the votes move to a neighbouring bin). Hough peaks blur slightly
across adjacent α bins; pose recovery is unaffected in practice because
clustering already merges poses within 2·Δα (ROT_THRESH, kernel.h:17).
NOT a parity engine — exact tallies come from engine="fast"/"reference".

Matmuls run in f32 (bin counts exceed bf16's 8-bit mantissa range).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

from objective_slam_tpu.ops import ppf as ppf_ops
from objective_slam_tpu.ops import voting as voting_ref
from objective_slam_tpu.ops import voting_fast as vf

ALPHA_BITS = vf.ALPHA_BITS
_ALPHA_SCALE = vf._ALPHA_SCALE


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["occ_keys", "m3_dup"],
                   meta_fields=["k_occ", "n_angle"])
@dataclasses.dataclass(frozen=True)
class CorrTables:
    """Correlation-engine model tables.

    occ_keys — (K_pad,) int32 sorted occupied packed keys, pad −2. The
               key → occupied-rank map is evaluated as a one-hot MXU
               contraction against this dictionary (a packed per-element
               table lookup costs the ~10 ns/element indexed-op floor —
               it was 16 ms of a 33 ms engine at 1.6M pairs; the matmul
               is ~2 ms).
    m3_dup   — (k_occ+1, 2·n_angle, n_m) f32: per-key α_m histogram over
               model points, duplicated along the α axis so every shift is
               a contiguous slice.
    """
    occ_keys: jax.Array
    m3_dup: jax.Array
    k_occ: int
    n_angle: int


def build_corr_tables(table: voting_ref.KeyTable, n_model: int,
                      n_angle: int = 30) -> CorrTables:
    """Host-side build from the key table (pairs sorted by key)."""
    counts = np.asarray(table.counts)
    offsets = np.asarray(table.offsets)
    pair_mr = np.asarray(table.pair_mr)
    pair_alpha = np.asarray(table.pair_alpha)

    occ_keys = np.nonzero(counts)[0]
    k_occ = len(occ_keys)
    k_pad = max(((k_occ + 127) // 128) * 128, 128)
    occ_dict = np.full((k_pad,), -2, np.int32)
    occ_dict[:k_occ] = occ_keys.astype(np.int32)

    # Coarse α_m bins via the same fixed-point quantization as the fast
    # engine (consistency of bin edges between the two sides).
    a_fix = np.clip(np.round((pair_alpha.astype(np.float64) + math.pi)
                             * _ALPHA_SCALE), 0,
                    (1 << ALPHA_BITS) - 1).astype(np.int64)
    b_m = ((a_fix * n_angle) >> ALPHA_BITS).astype(np.int64)

    # Which occupied key does each (key-sorted) pair belong to?
    pair_key_rank = np.repeat(np.arange(k_occ, dtype=np.int64),
                              counts[occ_keys])
    n_pairs = pair_key_rank.shape[0]
    m3 = np.zeros((k_occ + 1, n_angle, n_model), np.float32)
    np.add.at(m3, (pair_key_rank, b_m[:n_pairs], pair_mr[:n_pairs]), 1.0)
    m3_dup = np.concatenate([m3, m3], axis=1)        # (k_occ+1, 2n, n_m)

    return CorrTables(
        occ_keys=jnp.asarray(occ_dict),
        m3_dup=jnp.asarray(m3_dup),
        k_occ=k_occ, n_angle=n_angle)


def cast_votes_corr(scene_keys, scene_alpha, tables: CorrTables,
                    n_model: int, runs_cap: int | None = None
                    ) -> voting_ref.VoteResult:
    """Matmul voting: scene histogram + n_angle MXU contractions.

    The scene histogram S3 is built by SORT + RUN-LENGTH COALESCING, not a
    direct scatter-add: a per-pair scatter costs the TPU's ~20 ns/element
    indexed-op floor (~30 ms for a 1.6M-pair scene — it was the entire
    engine cost), while jnp.sort of the same data runs at HBM bandwidth
    (~0.05 ms). After sorting the (row, key, α-bin) cell ids, equal cells
    form runs; only the ~runs_cap unique cells are scattered.

    runs_cap bounds the unique-cell count (static shape). None → S // 6,
    comfortably above any scene measured; if the actual run count exceeds
    it, `overflowed` is set (tallies would be incomplete — raise the cap).

    Returns a VoteResult whose accumulator matches the exact engines up to
    ±1-α-bin transport (num_votes is exact)."""
    R, n = scene_keys.shape
    n_angle = tables.n_angle
    K1 = tables.k_occ + 1
    flat_keys = scene_keys.reshape(-1)
    flat_alpha = scene_alpha.reshape(-1)
    valid = flat_keys != ppf_ops.INVALID_KEY

    # key -> occupied rank via one-hot dictionary matmul (chunked so the
    # materialized one-hot stays bounded; INVALID_KEY matches nothing since
    # pad entries are -2). rank payload is offset by +1 so "no match"
    # (all-zero row) is distinguishable from rank 0.
    S = R * n
    K_pad = tables.occ_keys.shape[0]
    chunk = min(32768, vf._ceil_to(S, vf.LANES))
    S_pad = vf._ceil_to(S, chunk)
    keys_p = jnp.concatenate(
        [flat_keys, jnp.full((S_pad - S,), ppf_ops.INVALID_KEY, jnp.int32)])
    ranks1 = jnp.arange(1, K_pad + 1, dtype=jnp.float32)

    def one(kc):
        onehot = (kc[:, None] == tables.occ_keys[None, :]) \
            .astype(jnp.float32)
        return jnp.dot(onehot, ranks1,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    occ = jax.lax.map(one, keys_p.reshape(-1, chunk)).reshape(-1)[:S]
    occ = occ.astype(jnp.int32) - 1
    occ = jnp.where(occ >= 0, occ, tables.k_occ)

    a_fix = jnp.clip(jnp.round((flat_alpha + jnp.float32(math.pi))
                               * jnp.float32(_ALPHA_SCALE))
                     .astype(jnp.int32), 0, (1 << ALPHA_BITS) - 1)
    b_s = (a_fix * n_angle) >> ALPHA_BITS

    n_cells = R * K1 * n_angle
    if runs_cap is None:
        # Small scenes: cap = S (exact by construction, compaction is
        # cheap there). Large scenes: S // 6 — votes concentrate on far
        # fewer unique cells in practice; `overflowed` guards the bound
        # and drost.match auto-retries at the next capacity bucket, so
        # the heuristic can never silently truncate tallies.
        runs_cap = max(S // 6, 65536)
    runs_cap = min(vf._ceil_to(runs_cap, vf.LANES), S)

    r_of_s = jnp.arange(S, dtype=jnp.int32) // n
    tgt = (r_of_s * K1 + occ) * n_angle + b_s
    tgt = jnp.where(valid, tgt, n_cells)              # invalid → sentinel
    sv = jnp.sort(tgt)                                # (S,) sentinel at end
    new = jnp.concatenate([jnp.ones((1,), jnp.bool_), sv[1:] != sv[:-1]])
    n_runs = jnp.sum(new, dtype=jnp.int32)
    # Compact run-start positions in order: sort where(new, iota, INT_MAX)
    # — iota is strictly increasing, so a single-array sort is the stable
    # compaction at half the payload of argsort(key, iota).
    starts = jnp.sort(jnp.where(
        new, jnp.arange(S, dtype=jnp.int32),
        jnp.int32(np.iinfo(np.int32).max)))[:runs_cap]
    run_ok = jnp.arange(runs_cap, dtype=jnp.int32) < n_runs
    # Rows past the real run count hold arbitrary non-start positions —
    # pin them to S so the next-start difference of the LAST real run (and
    # of every dead row) is well-defined.
    starts = jnp.where(run_ok, starts, S)
    vals_u = sv[jnp.minimum(starts, S - 1)]           # (runs_cap,) cell ids
    next_start = jnp.concatenate([starts[1:], jnp.full((1,), S, jnp.int32)])
    cnts = jnp.where(run_ok, next_start - starts, 0)
    cell_ok = run_ok & (vals_u < n_cells)             # drop sentinel run
    s3 = jnp.zeros((n_cells,), jnp.float32) \
        .at[jnp.where(cell_ok, vals_u, n_cells)] \
        .add(jnp.where(cell_ok, cnts, 0).astype(jnp.float32),
             mode="drop") \
        .reshape(R, K1, n_angle)
    runs_overflow = n_runs > runs_cap
    # Unoccupied keys (rank k_occ) hit the all-zero m3 row; drop them from
    # the vote count only (they contribute nothing to the contraction).
    s3_flat = s3.reshape(R, K1 * n_angle)

    # num_votes (exact, integer — f32 cannot represent counts > 2^24):
    # Σ_k scene-hits[k] · bucket-size[k]. Per-cell products and per-row
    # sums are int32-exact (a single reference row with ≥ 2^31 votes is
    # not a realistic cloud); the GRAND total is summed as two int32
    # limbs and SATURATES to INT32_MAX instead of silently wrapping when
    # a vote-heavy scene passes 2^31 (this engine sizes no capacity from
    # it — the saturated sentinel is unmistakable where a wrapped value
    # would read as a plausible count).
    m_tot = jnp.sum(tables.m3_dup[:, :n_angle, :], axis=(1, 2)) \
        .astype(jnp.int32)                                        # (K1,)
    s_tot = jnp.sum(s3, axis=2).astype(jnp.int32)                 # (R, K1)
    row_votes = jnp.sum(s_tot * m_tot[None, :], axis=1,
                        dtype=jnp.int32)                          # (R,)
    num_votes = voting_ref.saturating_total(row_votes)

    # acc[r, m, a] = S3_flat @ m3_dup[:, o_a : o_a+n, :]  with
    # o_a = (n/2 - a) mod n  (coarse-bin identity: a ≈ b_s − b_m + n/2).
    half = n_angle // 2
    cols = []
    for a in range(n_angle):
        o_a = (half - a) % n_angle
        rhs = jax.lax.dynamic_slice_in_dim(tables.m3_dup, o_a, n_angle,
                                           axis=1)
        rhs = rhs.reshape(K1 * n_angle, n_model)
        cols.append(jnp.dot(s3_flat, rhs,
                            preferred_element_type=jnp.float32))  # (R, n_m)
    acc = jnp.stack(cols, axis=-1)                                # (R,n_m,n)
    A = voting_ref.ALPHA_PAD
    acc = jnp.round(acc).astype(jnp.int32)
    acc = jnp.pad(acc, ((0, 0), (0, 0), (0, A - n_angle)))
    return voting_ref.VoteResult(accumulator=acc, num_votes=num_votes,
                                 overflowed=runs_overflow)
