"""Block-expansion exact voting: zero per-element indexed ops in the hot path.

The legacy fast engine (ops/voting_fast.py) pays the measured TPU floor of
~10-16 ns for ONE indexed element access per vote (sublane take_along_axis
into the pair table) — ~500 ms for a 30M-vote scene. This engine removes
per-ELEMENT indexing entirely by exploiting two structural facts:

  1. votes of one scene pair read CONSECUTIVE pair-table slots (the bucket),
     so padding every bucket to whole 128-lane ROWS turns the per-vote
     gather into a per-row gather — measured ~6.5 ns per 128-wide row
     (~0.05 ns/element, 200x cheaper) because XLA lowers row gathers to
     row-granular DMA instead of element-serial moves;
  2. the model occupies few distinct keys (K_occ), so the "hash lookup" of
     each scene pair becomes an equality compare against the occupied-key
     dictionary contracted on the MXU — (count, bucket row start) arrive as
     one f32 matmul (exact: integer values < 2^24), replacing a second
     element-serial gather pass.

Pipeline (all static shapes):
  scene keys ──(S, K_occ) one-hot ⋅ (K_occ, 2) dictionary──> cnt, row_start
  per-segment row allocation (cumsum) + TWO per-ROW fills (cumsum-of-diffs
    at row granularity, 1-D scatters with tail corrections folded into the
    next head — pad rows/slots are handled by pair-table sentinels, not
    masks)
  pair rows ──ONE row gather──> (ROW_CAP, 128) packed (m << 22 | α_m_fix)
    ──fused XLA precode (integer α-binning, identical fixed-point formula
    to voting_fast — tallies are bit-equal)──> packed one-hot codes
  Pallas tally: per 64-row chunk, TWO iota compares per slot build the
    one-hot operands + MXU accumulate at full systolic width (H·32 narrow
    side), written DIRECTLY into the per-reference-row accumulator via a
    scalar-prefetched chunk→row output map.

Replaces the role of ppf_vote_count_kernel + ppf_vote_kernel + vote
sort/histogram (reference src/cuda/kernel.cu:480-554, model.cu:95-151).

Built only for models that fit the packing budgets (n_m <= 1024 model
points, K_occ <= BLOCK_MAX_KOCC occupied keys); larger models fall back to
the legacy fast paths automatically (see voting_fast.build_fast_tables).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from objective_slam_tpu.ops import ppf as ppf_ops
from objective_slam_tpu.ops import voting as voting_ref
from objective_slam_tpu.ops import voting_fast as vf

LANES = 128
CHUNK_ROWS = 64                 # tally chunk = 64 rows = 8192 vote slots
                                # (row-alignment padding costs CHUNK_ROWS
                                # rows per reference row — 128 measured
                                # ~0.5 ms faster at bench scale but doubles
                                # that padding; 64 is the balance)
TALLY_GROW = 64                 # vote rows fused per MXU contraction
                                # (k = 8192; swept on v5e — amortizes the
                                # per-group loop/accumulate fixed costs)
TALLY_DTYPE = "int8"            # one-hot operand dtype ("int8" contracts
                                # at the MXU's 2x int8 rate and accumulates
                                # in int32 — exact by construction; swept
                                # vs bfloat16 on v5e)
TALLY_CMP_DTYPE = "int32"       # iota-compare dtype for the in-kernel
                                # one-hot build (codes fit 15 bits, so
                                # int16 is exact). The compares are the
                                # tally's VPU bottleneck (~224/slot after
                                # _precode); sub-32-bit vector compares
                                # could pack multiple lanes per cycle —
                                # but BOTH int16 and uint8 fail Mosaic
                                # compilation on the v5e toolchain
                                # (remote-compile crash; swept round 5,
                                # tools/ablate_tally_cmp.py), so int32 is
                                # the only working choice. Bit-equality
                                # vs the fast engine is enforced by the
                                # bench gate either way.
ALPHA_BITS = 22                 # fixed-point α (shared with voting_fast)
M_BITS = 32 - ALPHA_BITS        # model point index field (n_m <= 1024)
_ALPHA_SCALE = (1 << ALPHA_BITS) / (2.0 * math.pi)
# Dictionary-compare cost is S x K_pad; beyond this the legacy tga path wins
# (sparse buckets also make row padding expensive).
BLOCK_MAX_KOCC = 4096
# Scene-pair chunk for the dictionary matmul: bounds the materialized
# one-hot to DICT_CHUNK x K_pad f32.
DICT_CHUNK = 32768


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["occ_keys", "occ_vals", "pair2d"],
    meta_fields=["k_occ", "n_rows"])
@dataclasses.dataclass(frozen=True)
class BlockTables:
    """Bucket-padded model tables for block-expansion voting.

    occ_keys — (K_pad,) int32 occupied packed keys, pad = -2 (INVALID_KEY is
               INT_MAX and valid packed keys are in [0, num_keys); neither
               equals -2, so padded/invalid scene pairs match nothing by
               construction).
    occ_vals — (K_pad, 2) f32 [bucket vote count, bucket start ROW] — the
               dictionary payload contracted on the MXU.
    pair2d   — (n_rows + 1, 128) uint32 (m << ALPHA_BITS | α_m fixed
               point). Each bucket is padded to whole rows with the
               SENTINEL slot 0xFFFFFFFF, whose m field decodes to
               (1 << M_BITS) − 1 — a model index the build gate reserves
               (n_m < 2^M_BITS strictly), so sentinel slots tally into a
               column the accumulator slice discards. Row n_rows is an
               all-sentinel row that padding vote rows point at. This
               removes the per-row valid-lane masking from the hot tally
               entirely.
    """
    occ_keys: jax.Array
    occ_vals: jax.Array
    pair2d: jax.Array
    k_occ: int
    n_rows: int


def build_block_tables(table: voting_ref.KeyTable,
                       max_kocc: int = BLOCK_MAX_KOCC
                       ) -> Optional[BlockTables]:
    """Host-side build from the key table; None if the model doesn't fit
    the packing budgets (caller falls back to the legacy fast tables)."""
    counts = np.asarray(table.counts)
    offsets = np.asarray(table.offsets)
    pair_mr = np.asarray(table.pair_mr)
    pair_alpha = np.asarray(table.pair_alpha)

    occ = np.nonzero(counts)[0]
    k_occ = len(occ)
    n_m = int(pair_mr.max(initial=0)) + 1
    # Strict bound reserves m = 2^M_BITS − 1 as the pad-slot sentinel.
    if k_occ == 0 or k_occ > max_kocc or n_m >= (1 << M_BITS):
        return None

    occ_cnt = counts[occ].astype(np.int64)
    occ_rows = (occ_cnt + LANES - 1) // LANES
    row_start = np.concatenate([[0], np.cumsum(occ_rows)[:-1]])
    n_rows = int(occ_rows.sum())

    a_fix = np.clip(np.round((pair_alpha.astype(np.float64) + math.pi)
                             * _ALPHA_SCALE), 0,
                    (1 << ALPHA_BITS) - 1).astype(np.uint32)
    packed = (pair_mr.astype(np.uint32) << ALPHA_BITS) | a_fix

    # Pad slots AND the trailing all-pad row are the sentinel 0xFFFFFFFF:
    # they tally into the reserved m column and are sliced away.
    pair2d = np.full((n_rows + 1, LANES), 0xFFFFFFFF, np.uint32)
    flat = pair2d.reshape(-1)
    for i, k in enumerate(occ):
        s = row_start[i] * LANES
        flat[s:s + occ_cnt[i]] = packed[offsets[k]:offsets[k] + occ_cnt[i]]

    K_pad = _ceil_to(max(k_occ, 1), LANES)
    occ_keys = np.full((K_pad,), -2, np.int32)
    occ_keys[:k_occ] = occ.astype(np.int32)
    occ_vals = np.zeros((K_pad, 2), np.float32)
    occ_vals[:k_occ, 0] = occ_cnt
    occ_vals[:k_occ, 1] = row_start

    return BlockTables(occ_keys=jnp.asarray(occ_keys),
                       occ_vals=jnp.asarray(occ_vals),
                       pair2d=jnp.asarray(pair2d),
                       k_occ=k_occ, n_rows=n_rows)


DICT_DIGITS = True              # single-pass digit-split contraction vs
                                # the legacy 6-pass f32 HIGHEST matmul
                                # (measured on v5e — see _dict_match_digits)


def _dict_match_digits(flat_keys, tables: BlockTables):
    """(cnt, row_start) via a SINGLE-PASS bf16 dictionary matmul.

    The legacy form needs Precision.HIGHEST (6 bf16 MXU passes) because the
    payload integers (< 2^24) exceed bf16's 8-bit mantissa; the digit-split
    contraction (voting_fast.dict_digits_matmul — four 7-bit digits cover
    2^24, exact by construction) does it in one default-precision pass.
    The (K_pad, 8) digit table is recomputed from occ_vals per call — a
    K_pad-sized op, free next to the S×K_pad contraction."""
    out = vf.dict_digits_matmul(flat_keys, tables.occ_keys,
                                tables.occ_vals, n_digits=4)
    cnt = out[:, 0].astype(jnp.int32)
    brs = out[:, 1].astype(jnp.int32)
    return cnt, brs


def _dict_match(flat_keys, tables: BlockTables):
    """(cnt, row_start) per scene pair via one-hot dictionary matmul.

    Exact: each key matches at most one dictionary entry (occupied keys are
    distinct) and payload integers are < 2^24.

    On TPU the compare FUSES into the matmul's operand read (verified: the
    one-shot S×K_pad contraction costs ~2 ms at S=1.6M, K_pad=512 — HBM
    traffic is the inputs/outputs only, not the one-hot). A hand-written
    Pallas equivalent measured SLOWER (~6 ms: the (C,1)→lanes broadcast
    relayout per block beats the fused XLA form). On CPU the one-hot WOULD
    materialize (S·K_pad·4 bytes), so the host path chunks it."""
    S = flat_keys.shape[0]

    if jax.default_backend() == "tpu":
        if DICT_DIGITS:
            return _dict_match_digits(flat_keys, tables)
        onehot = (flat_keys[:, None] == tables.occ_keys[None, :]) \
            .astype(jnp.float32)
        # HIGHEST precision: the payload integers (counts, row starts)
        # exceed bf16's 8-bit mantissa; a default-precision (bf16) pass
        # silently rounds them.
        out = jnp.dot(onehot, tables.occ_vals,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out[:, 0].astype(jnp.int32), out[:, 1].astype(jnp.int32)

    chunk = min(DICT_CHUNK, _ceil_to(S, LANES))
    S_pad = _ceil_to(S, chunk)
    keys_p = jnp.concatenate(
        [flat_keys, jnp.full((S_pad - S,), -2, jnp.int32)])

    def one(kc):
        onehot = (kc[:, None] == tables.occ_keys[None, :]) \
            .astype(jnp.float32)
        # HIGHEST precision: the payload integers (counts, row starts)
        # exceed bf16's 8-bit mantissa; a default-precision (bf16) pass
        # silently rounds them.
        return jnp.dot(onehot, tables.occ_vals,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (chunk, 2)

    out = jax.lax.map(one, keys_p.reshape(-1, chunk))
    out = out.reshape(S_pad, 2)[:S]
    cnt = out[:, 0].astype(jnp.int32)
    brs = out[:, 1].astype(jnp.int32)
    return cnt, brs


def rows_for_counts(cnt):
    """Vote rows a segment of cnt votes occupies (ceil(cnt / 128))."""
    return (cnt + LANES - 1) // LANES


def cast_votes_block(scene_keys, scene_alpha, tables: BlockTables,
                     n_model: int, d_angle: float, vote_cap: int,
                     chunk_rows: int = CHUNK_ROWS,
                     seg_cap: int | None = None) -> voting_ref.VoteResult:
    """Generate and tally votes (block-expansion exact engine).

    Tallies are bit-identical to voting_fast.cast_votes_fast (same vote set,
    same 22-bit fixed-point α binning).

    Args:
      scene_keys: (R, n) int32 packed PPF keys (INVALID_KEY masked).
      scene_alpha: (R, n) float32 α_s per scene pair.
      vote_cap: static capacity in SLOTS; internally rows = vote_cap // 128.
        Must cover sum(ceil(cnt/128))*128 per scene pair plus up to one
        chunk (chunk_rows*128 slots) of row-alignment padding per reference
        row (see drost.match sizing).
      seg_cap: static bound on the number of NONZERO scene-pair segments
        (pairs with at least one matching model pair). Every indexed step
        of the expansion runs at this scale, so a tight bound (drost sizes
        it exactly from the count pass) is a large win; None falls back to
        row_cap (always sufficient: each nonzero segment occupies ≥ 1 vote
        row). Exceeding it sets `overflowed`.
    """
    R, n = scene_keys.shape
    (pp, alpha_row, row_start_p, total, overflow, row_cap,
     total_rows_p) = \
        _expand(scene_keys, scene_alpha, tables, vote_cap, chunk_rows,
                seg_cap)
    acc = _tally(pp, alpha_row,
                 r_of_chunk_start=row_start_p, R=R, n_model=n_model,
                 d_angle=d_angle, chunk_rows=chunk_rows, row_cap=row_cap,
                 total_rows_p=total_rows_p)
    return voting_ref.VoteResult(accumulator=acc, num_votes=total,
                                 overflowed=overflow)


def _expand(scene_keys, scene_alpha, tables: BlockTables, vote_cap: int,
            chunk_rows: int, seg_cap: int | None = None):
    """Dictionary match + row allocation + per-row fills + THE row gather.

    Returns (pp, alpha_row, row_start_p, total, overflow, row_cap,
    total_rows_p) — everything the tally needs."""
    row_cap = max(vote_cap // LANES, chunk_rows)
    row_cap = _ceil_to(row_cap, chunk_rows)
    R, n = scene_keys.shape
    S = R * n
    if seg_cap is None:
        seg_cap = row_cap
    seg_cap = min(_ceil_to(max(seg_cap, LANES), LANES), S)
    flat_keys = scene_keys.reshape(-1)
    flat_alpha = scene_alpha.reshape(-1)

    cnt, brs = _dict_match(flat_keys, tables)               # (S,), (S,)
    crows = rows_for_counts(cnt)                            # (S,) rows/segment

    # Row-aligned padding so every tally chunk maps to one reference row.
    row_tot = jnp.sum(crows.reshape(R, n), axis=1)          # (R,) in rows
    pad_row = (-row_tot) % chunk_rows
    row_tot_p = row_tot + pad_row
    row_start_p = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(row_tot_p, dtype=jnp.int32)[:-1]])
    row_cum = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(row_tot, dtype=jnp.int32)[:-1]])

    roffs = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(crows, dtype=jnp.int32)[:-1]])           # (S,) excl scan
    # Padded head of each segment: per-REFERENCE-row pad offset broadcast
    # over the row's n scene pairs (no S-sized gather — repeat is dense).
    pad_before = jnp.broadcast_to(
        (row_start_p - row_cum)[:, None], (R, n)).reshape(-1)
    heads = roffs + pad_before
    total_rows_p = row_start_p[-1] + row_tot_p[-1]
    overflow = total_rows_p > row_cap

    # True vote total: per-row int32 sums (exact), saturating grand total
    # (cap sizing in drost handles the int64-safe total on host).
    total = voting_ref.saturating_total(
        jnp.sum(cnt.reshape(R, n), axis=1, dtype=jnp.int32))

    alpha_fix = jnp.round((flat_alpha + jnp.float32(math.pi))
                          * jnp.float32(_ALPHA_SCALE)).astype(jnp.int32)
    alpha_fix = jnp.clip(alpha_fix, 0, (1 << ALPHA_BITS) - 1)

    # Stream-compact the nonzero segments (typically a few % of S). Every
    # per-element indexed op on this TPU costs ~10-30 ns/element, so the
    # compaction is an S-sized sort (sorts run at HBM bandwidth) followed
    # by seg_cap-sized row gathers — NOT an S-sized scatter (which alone
    # used to cost ~30 ms at 1.6M pairs). Sorting where(nz, iota, INT_MAX)
    # is a SINGLE-array sort whose sorted prefix IS the compacted index
    # list (iota is strictly increasing, so stability is free) — half the
    # payload of the argsort(key, iota) form.
    nz = crows > 0
    n_seg = jnp.sum(nz, dtype=jnp.int32)
    seg_overflow = n_seg > seg_cap
    starts = jnp.sort(jnp.where(
        nz, jnp.arange(S, dtype=jnp.int32),
        jnp.int32(np.iinfo(np.int32).max)))[:seg_cap]
    seg_ok = jnp.arange(seg_cap, dtype=jnp.int32) < n_seg
    gidx = jnp.where(seg_ok, starts, 0)
    payload = jnp.stack([cnt, brs, alpha_fix, heads], axis=1)     # (S, 4)
    compact = jnp.where(seg_ok[:, None], payload[gidx], 0)  # (seg_cap, 4)
    c_cnt = compact[:, 0]
    c_brs = compact[:, 1]
    c_alpha = compact[:, 2]
    c_heads = compact[:, 3]
    c_tail = c_heads + rows_for_counts(c_cnt)
    c_row = gidx // n                       # owning reference row

    # Two per-row transports (pair-table source row via u, α_s), each as
    # cumsum-of-diffs. Measured scatter economics on this chip: 1-D
    # scatters cost ~13 ns/row vs ~50 ns/row for (N, k) row scatters, and
    # within one reference row consecutive segments are back-to-back
    # (heads = exclusive scan), so the tail correction of segment j−1
    # FOLDS into the head diff of segment j. What remains is ONE 1-D
    # head scatter per channel plus an R-sized correction at each
    # reference row's padding boundary — ~4x cheaper than the head+tail
    # row-scatter pair it replaces.
    #
    # u = brs − head + OFFSET with OFFSET > row_cap keeps u ≥ 1 inside
    # segments while the fill is exactly 0 on padding rows — the fill
    # itself marks validity, replacing the lanes_valid channel (pad rows
    # point at the all-sentinel pair2d row n_rows).
    offset = jnp.int32(row_cap + 1)
    u = c_brs - c_heads + offset
    prev_tail = jnp.concatenate([jnp.full((1,), -1, jnp.int32), c_tail[:-1]])
    prev_row = jnp.concatenate([jnp.full((1,), -1, jnp.int32), c_row[:-1]])
    prev_u = jnp.concatenate([jnp.zeros((1,), jnp.int32), u[:-1]])
    prev_a = jnp.concatenate([jnp.zeros((1,), jnp.int32), c_alpha[:-1]])
    contig = (prev_tail == c_heads) & (prev_row == c_row)
    head_idx = jnp.where(seg_ok, c_heads, row_cap)
    du = jnp.where(contig, u - prev_u, u)
    da = jnp.where(contig, c_alpha - prev_a, c_alpha)

    # Per-reference-row boundary corrections: the fill returns to 0 at the
    # start of the row's padding (R-sized — negligible scatter cost).
    segs_per_row = jnp.sum(nz.reshape(R, n), axis=1, dtype=jnp.int32)
    last_seg = jnp.clip(jnp.cumsum(segs_per_row, dtype=jnp.int32) - 1,
                        0, seg_cap - 1)
    has_seg = segs_per_row > 0
    u_last = jnp.where(has_seg, u[last_seg], 0)
    a_last = jnp.where(has_seg, c_alpha[last_seg], 0)
    row_end = jnp.where(has_seg, row_start_p + row_tot, row_cap)

    d_u = jnp.zeros((row_cap,), jnp.int32) \
        .at[head_idx].add(jnp.where(seg_ok, du, 0), mode="drop") \
        .at[row_end].add(-u_last, mode="drop")
    d_a = jnp.zeros((row_cap,), jnp.int32) \
        .at[head_idx].add(jnp.where(seg_ok, da, 0), mode="drop") \
        .at[row_end].add(-a_last, mode="drop")
    fill_u = jnp.cumsum(d_u, dtype=jnp.int32)
    alpha_row = jnp.cumsum(d_a, dtype=jnp.int32)

    t_iota = jnp.arange(row_cap, dtype=jnp.int32)
    # src_row[t] = brs[s] + (t − head[s]) inside segments; the all-sentinel
    # row n_rows on padding rows (fill 0). The clip only matters on
    # overflow (flagged) — in-range segments stay within their bucket.
    src_row = jnp.where(fill_u > 0,
                        jnp.clip(fill_u - offset + t_iota, 0,
                                 tables.n_rows),
                        tables.n_rows)

    overflow = overflow | seg_overflow

    # THE gather: one row-granular DMA per vote row.
    pp = jnp.take(tables.pair2d, src_row, axis=0)           # (row_cap, 128)

    return (pp, alpha_row, row_start_p, total, overflow,
            row_cap, total_rows_p)


def _chunk_row_map(r_of_chunk_start, R, chunk_rows, n_chunks):
    """chunk → owning reference row (row starts are chunk-aligned by
    construction: scatter each row id at its first chunk + cummax).

    NO clipping of the scatter index: an empty TRAILING reference row
    whose start equals a full buffer's end (row_start_p == row_cap, i.e.
    start chunk == n_chunks) must DROP out of the map — clipping it to
    n_chunks − 1 used to claim the last data chunk for the empty row,
    silently mis-crediting that chunk's tallies whenever vote_cap was
    sized exactly full."""
    start_chunk = r_of_chunk_start // chunk_rows         # in [0, n_chunks]
    cmap = jnp.zeros((n_chunks,), jnp.int32).at[start_chunk].max(
        jnp.arange(R, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(cmap, axis=0), start_chunk


def _unpack_bin(pp_i32, a_s, n_angle):
    """In-register unpack + integer α binning (bit-equal to voting_fast:
    bin = ((α_s − α_m + 2²¹) mod 2²²) · n_angle >> 22)."""
    m = jax.lax.shift_right_logical(pp_i32, ALPHA_BITS)
    a_m = pp_i32 & jnp.int32((1 << ALPHA_BITS) - 1)
    half = jnp.int32(1 << (ALPHA_BITS - 1))
    mask = jnp.int32((1 << ALPHA_BITS) - 1)
    w = (a_s - a_m + half) & mask
    a_bin = jnp.clip((w * n_angle) >> ALPHA_BITS, 0, voting_ref.ALPHA_PAD - 1)
    return m, a_bin


def _precode(pp_i32, alpha_row, n_angle):
    """Packed one-hot codes for the tally kernel, computed ONCE in XLA.

    code = ((m_hi · ALPHA_PAD + a_bin) << 7) | m_lo  (< 2^15), so the
    Pallas kernel's one-hot generation collapses to exactly TWO iota
    compares per slot — a 128-row wide operand from the low 7 bits and an
    (H · ALPHA_PAD)-row narrow operand from the high bits — instead of the
    previous in-kernel α broadcast loop + per-h masking (~540 VPU ops per
    slot, the measured round-3 tally bottleneck). This pass is elementwise
    over the gathered vote rows, so XLA fuses it into the row gather's
    consumer; α never enters the kernel.

    Sentinel slots (0xFFFFFFFF) decode to m_hi = 7, m_lo = 127: for models
    with H < 8 the narrow code ≥ H·ALPHA_PAD misses the one-hot entirely;
    at H = 8 it tallies into reserved column 1023, which the accumulator
    slice discards (the build gate keeps n_m < 2^M_BITS strictly) —
    bit-identical to the previous per-h masked form."""
    m, a_bin = _unpack_bin(pp_i32, alpha_row[:, None], n_angle)
    m_lo = m & 127
    m_hi = jax.lax.shift_right_logical(m, 7)
    return ((m_hi * voting_ref.ALPHA_PAD + a_bin) << 7) | m_lo


def _tally(pp, alpha_row, r_of_chunk_start, R, n_model,
           d_angle, chunk_rows, row_cap, total_rows_p=None):
    """Fused unpack + α-bin + one-hot MXU tally, accumulated DIRECTLY into
    the per-reference-row accumulator.

    TPU path: the output block index is data-driven (scalar-prefetched
    chunk→row map): consecutive chunks of one reference row revisit the
    same (1, m_pad, A) block, which stays resident in VMEM and is written
    back once per row — no (n_chunks, m_pad, A) partials array, no
    cross-chunk cumsum, no row-boundary slicing. Chunks past the true row
    count (capacity slack) are predicated off, so over-sizing vote_cap
    costs DMA only, not MXU work.

    Per group, ONE (H·A, K) narrow operand (so the MXU contraction runs at
    N = H·A instead of H separate N = 32 passes — N < 128 wastes the
    systolic array's width, measured ~3x on the bench workload) and one
    (128, K) wide operand are each built with a SINGLE iota compare from
    the precomputed packed codes (_precode) — the α broadcast and per-h
    masking that made the round-3 kernel VPU-bound live in XLA now, fused
    into the row gather."""
    A = voting_ref.ALPHA_PAD
    n_chunks = row_cap // chunk_rows
    m_pad = _ceil_to(n_model, 128)
    n_angle = int(round(2.0 * math.pi / d_angle))
    pp_i32 = pp.view(jnp.int32) if pp.dtype == jnp.uint32 else pp

    G = chunk_rows
    ppv = pp_i32.reshape(n_chunks, G, LANES)
    av = alpha_row.reshape(n_chunks, 1, G)

    if jax.default_backend() == "tpu":
        H = m_pad // 128
        # Rows per MXU contraction: GROW rows fuse into one k = GROW·128
        # matmul (a free row-major HBM reshape), amortizing small-matmul
        # setup.
        GROW = TALLY_GROW
        assert G % GROW == 0
        n_grp = G // GROW
        K = GROW * LANES
        NA = H * A

        # One-hot codes precomputed in XLA (fuses with the row gather);
        # the kernel unpacks them with two shifts and two iota compares.
        codes = _precode(pp_i32, alpha_row, n_angle)
        ppg = codes.reshape(n_chunks, n_grp, K)

        cmap, start_chunk = _chunk_row_map(r_of_chunk_start, R,
                                           chunk_rows, n_chunks)
        if total_rows_p is None:
            live = jnp.full((1,), n_chunks, jnp.int32)
        else:
            live = jnp.minimum(
                (total_rows_p + chunk_rows - 1) // chunk_rows,
                n_chunks).reshape(1).astype(jnp.int32)

        oh_dtype = jnp.dtype(TALLY_DTYPE)
        acc_dtype = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32

        cmp_dtype = jnp.dtype(TALLY_CMP_DTYPE)

        def kernel(cmap_ref, live_ref, pp_ref, out_ref):
            i = pl.program_id(0)
            first = jnp.logical_or(
                i == 0, cmap_ref[i] != cmap_ref[jnp.maximum(i - 1, 0)])

            @pl.when(first)
            def _init():
                out_ref[...] = jnp.zeros_like(out_ref)

            @pl.when(i < live_ref[0])
            def _accumulate():
                iota_lo = jax.lax.broadcasted_iota(cmp_dtype, (128, K), 0)
                iota_na = jax.lax.broadcasted_iota(cmp_dtype, (NA, K), 0)

                def group(g, acc):
                    pr = pp_ref[0, g, :][None, :]                # (1, K)
                    # Two-level one-hot from the precomputed code: the 7
                    # low bits build the 128-row WIDE operand, the high
                    # bits (m_hi · A + a_bin) the (H·A)-row narrow operand
                    # — two iota compares per slot total, in the narrow
                    # TALLY_CMP_DTYPE (the code fits 15 bits). No validity
                    # mask: pad slots/rows carry the pair-table sentinel,
                    # whose code misses the narrow one-hot (H < 8) or
                    # lands in the reserved m column the accumulator
                    # slice discards (H = 8) — see _precode.
                    m_lo = (pr & 127).astype(cmp_dtype)
                    c_hi = jax.lax.shift_right_logical(
                        pr, 7).astype(cmp_dtype)
                    om_lo = (m_lo == iota_lo).astype(oh_dtype)   # (128, K)
                    oa = (c_hi == iota_na).astype(oh_dtype)      # (H·A, K)
                    return acc + jax.lax.dot_general(
                        om_lo, oa, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype)        # (128, H·A)

                acc = jax.lax.fori_loop(
                    0, n_grp, group,
                    jnp.zeros((128, NA), acc_dtype))
                # Exact: per-chunk per-cell counts <= G·128 << 2^24.
                acci = acc.astype(jnp.int32)
                for h in range(H):
                    out_ref[0, h * 128:(h + 1) * 128, :] += \
                        acci[:, h * A:(h + 1) * A]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, n_grp, K), lambda i, cm, lv_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, m_pad, A),
                                   lambda i, cm, lv_: (cm[i], 0, 0)),
        )
        acc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, m_pad, A), jnp.int32),
        )(cmap, live, ppg)
        # Rows with no vote chunks may never be visited (their block holds
        # whatever the buffer contained) — zero them explicitly.
        end_chunk = jnp.concatenate([start_chunk[1:], live])
        has_chunks = end_chunk > start_chunk
        acc = jnp.where(has_chunks[:, None, None], acc, 0)
        return acc[:, :n_model, :]
    else:
        # XLA twin (CPU tests / interpret-free golden runs). Sentinel
        # slots decode to m = 2^M_BITS − 1, which the build gate reserves
        # (n_m < 2^M_BITS): it either misses the one-hot (m >= m_pad) or
        # lands in a column the final slice discards.
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)

        def chunk_partial(args):
            p, a = args                          # (G,128),(1,G)
            m, a_bin = _unpack_bin(p, a[0][:, None], n_angle)
            mf = m.reshape(-1)
            af = a_bin.reshape(-1)
            om = (mf[:, None] == iota_m).astype(jnp.bfloat16)
            oa = (af[:, None] == iota_a).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                om, oa, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        partials = jax.lax.map(chunk_partial, (ppv, av), batch_size=8)

    # int32 chunk-combine (per-chunk partials are exact ints <= G*128; the
    # cross-chunk cumsum can exceed 2^24 per cell — f32 exactness bound).
    cum = jnp.cumsum(jnp.round(partials).astype(jnp.int32), axis=0)
    cum = jnp.concatenate([jnp.zeros((1, m_pad, A), jnp.int32), cum],
                          axis=0)
    row_chunk_start = jnp.clip(r_of_chunk_start // chunk_rows, 0, n_chunks)
    row_chunk_end = jnp.concatenate([
        row_chunk_start[1:], jnp.full((1,), n_chunks, jnp.int32)])
    acc = cum[jnp.clip(row_chunk_end, 0, n_chunks)] - cum[row_chunk_start]
    return acc[:, :n_model, :]
