"""Block-expansion exact engine (ops/voting_block.py): bit-equality with the
legacy fast engine and the readable reference engine, capacity semantics,
and end-to-end dispatch through drost.match."""

import math

import numpy as np
import jax.numpy as jnp

from objective_slam_tpu.config import PPFConfig
from objective_slam_tpu.models import drost
from objective_slam_tpu.ops import (ppf as ppf_ops, voting, voting_block,
                                    voting_fast)
from objective_slam_tpu.utils import synthetic

D_ANGLE = 2 * math.pi / 30


def small_cloud(rng, n):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts, nrm.astype(np.float32)


def _keys_and_tables(rng, n_m=24, n_s=40, d_dist=0.5, ref_point_df=1):
    m_pts, m_nrm = small_cloud(rng, n_m)
    s_pts, s_nrm = small_cloud(rng, n_s)
    max_bin = 32
    num_keys = ppf_ops.num_keys(max_bin)
    mk, ma = ppf_ops.pairwise_ppf_keys(m_pts, m_nrm, d_dist, D_ANGLE, max_bin)
    table = voting.build_key_table(mk, ma, num_keys)
    ref_idx = jnp.arange(0, n_s, ref_point_df, dtype=jnp.int32)
    sk, sa = ppf_ops.pairwise_ppf_keys(s_pts, s_nrm, d_dist, D_ANGLE,
                                       max_bin, ref_indices=ref_idx)
    return table, sk, sa, n_m


def test_block_tables_cover_all_pairs(rng):
    table, *_ = _keys_and_tables(rng)
    bt = voting_block.build_block_tables(table)
    assert bt is not None
    counts = np.asarray(table.counts)
    occ = np.nonzero(counts)[0]
    assert bt.k_occ == len(occ)
    # Every bucket's slots appear in pair2d at its dictionary row start.
    occ_keys = np.asarray(bt.occ_keys)
    occ_vals = np.asarray(bt.occ_vals)
    pair2d = np.asarray(bt.pair2d).reshape(-1)
    offsets = np.asarray(table.offsets)
    pair_mr = np.asarray(table.pair_mr)
    for i, k in enumerate(occ):
        assert occ_keys[i] == k
        c = int(occ_vals[i, 0])
        assert c == counts[k]
        s = int(occ_vals[i, 1]) * 128
        got_m = pair2d[s:s + c] >> voting_block.ALPHA_BITS
        np.testing.assert_array_equal(got_m,
                                      pair_mr[offsets[k]:offsets[k] + c])


def test_block_matches_fast_exactly(rng):
    """The block engine must reproduce the legacy fast engine's tallies
    bit-for-bit (same vote set, same fixed-point α binning)."""
    table, sk, sa, n_m = _keys_and_tables(rng)
    ft = voting_fast.build_fast_tables(table)
    assert ft.block is not None
    cap_fast = 1 << 18
    out_fast = voting_fast.cast_votes_fast(sk, sa, ft, n_m, D_ANGLE,
                                           cap_fast)
    out_block = voting_block.cast_votes_block(sk, sa, ft.block, n_m,
                                              D_ANGLE, cap_fast)
    assert not bool(out_fast.overflowed)
    assert not bool(out_block.overflowed)
    assert int(out_fast.num_votes) == int(out_block.num_votes)
    np.testing.assert_array_equal(np.asarray(out_fast.accumulator),
                                  np.asarray(out_block.accumulator))


def test_block_matches_fast_with_ref_df(rng):
    table, sk, sa, n_m = _keys_and_tables(rng, n_s=33, ref_point_df=4)
    ft = voting_fast.build_fast_tables(table)
    out_fast = voting_fast.cast_votes_fast(sk, sa, ft, n_m, D_ANGLE, 1 << 18)
    out_block = voting_block.cast_votes_block(sk, sa, ft.block, n_m,
                                              D_ANGLE, 1 << 18)
    np.testing.assert_array_equal(np.asarray(out_fast.accumulator),
                                  np.asarray(out_block.accumulator))


def test_block_overflow_flag(rng):
    table, sk, sa, n_m = _keys_and_tables(rng)
    bt = voting_block.build_block_tables(table)
    tiny = voting_block.cast_votes_block(sk, sa, bt, n_m, D_ANGLE,
                                         vote_cap=128)
    assert bool(tiny.overflowed)


def test_build_declines_oversize_models(rng):
    table, *_ = _keys_and_tables(rng)
    assert voting_block.build_block_tables(table, max_kocc=1) is None
    ft = voting_fast.build_fast_tables(table, force_unpacked=True)
    assert ft.block is None          # legacy fallback stays testable


def test_match_e2e_block_vs_legacy(rng):
    """drost.match dispatches to the block engine and recovers the same
    planted pose as the legacy fast path (identical accumulators)."""
    m_pts, m_nrm = synthetic.blob_cloud(rng, 220)
    c_pts, c_nrm = synthetic.blob_cloud(rng, 420)
    c_pts = c_pts * 1.8 + np.float32([2.5, 0.0, 0.0])
    scene, scene_n, T_true = synthetic.plant_model(rng, m_pts, m_nrm,
                                                   c_pts, c_nrm)
    cfg = PPFConfig(max_poses=256, ref_point_df=3)
    desc = drost.build_model_description(m_pts, m_nrm, cfg)
    assert desc.fast_tables.block is not None
    res = drost.match(desc, scene, scene_n, cfg)
    assert not bool(res.overflowed)

    # Legacy path: strip the block tables, same config.
    desc_legacy = drost.ModelDescription(
        points=desc.points, normals=desc.normals, beta=desc.beta,
        gamma=desc.gamma, vote_weights=desc.vote_weights, table=desc.table,
        d_dist=desc.d_dist,
        fast_tables=desc.fast_tables._replace(block=None),
        corr_tables=None, fnv_remap=None, n_points=desc.n_points,
        num_keys=desc.num_keys,
        max_dist_bin=desc.max_dist_bin, diameter=desc.diameter)
    res_legacy = drost.match(desc_legacy, scene, scene_n, cfg)
    np.testing.assert_array_equal(np.asarray(res.accumulator),
                                  np.asarray(res_legacy.accumulator))
    np.testing.assert_allclose(np.asarray(res.pose),
                               np.asarray(res_legacy.pose), atol=1e-5)


def test_dict_match_digits_exact(rng):
    """The single-pass digit-split dictionary contraction
    (_dict_match_digits, the TPU default) returns bit-identical
    (count, row_start) to the chunked HIGHEST-precision path for payload
    integers up to the engine's 2^24 exactness bound — including values
    far past bf16's 8-bit mantissa, misses, and INVALID_KEY pairs."""
    k_occ = 300
    K_pad = voting_block._ceil_to(k_occ, voting_block.LANES)
    keys = rng.choice(1 << 20, size=k_occ, replace=False).astype(np.int32)
    occ_keys = np.full((K_pad,), -2, np.int32)
    occ_keys[:k_occ] = keys
    occ_vals = np.zeros((K_pad, 2), np.float32)
    # Counts/row starts spanning 1..2^24-1 (the engine's exactness bound).
    occ_vals[:k_occ, 0] = rng.integers(1, (1 << 24) - 1, size=k_occ)
    occ_vals[:k_occ, 1] = rng.integers(0, (1 << 24) - 1, size=k_occ)
    bt = voting_block.BlockTables(
        occ_keys=jnp.asarray(occ_keys), occ_vals=jnp.asarray(occ_vals),
        pair2d=jnp.zeros((1, 128), jnp.uint32), k_occ=k_occ, n_rows=0)

    hits = rng.choice(keys, size=900).astype(np.int32)
    misses = rng.choice(1 << 20, size=300).astype(np.int32)
    invalid = np.full((100,), np.iinfo(np.int32).max, np.int32)
    flat = jnp.asarray(np.concatenate([hits, misses, invalid]))

    cnt_d, brs_d = voting_block._dict_match_digits(flat, bt)
    cnt_r, brs_r = voting_block._dict_match(flat, bt)
    np.testing.assert_array_equal(np.asarray(cnt_d), np.asarray(cnt_r))
    np.testing.assert_array_equal(np.asarray(brs_d), np.asarray(brs_r))


def test_chunk_row_map_full_buffer_empty_trailing_row():
    """The exactly-full-buffer corner: an empty trailing reference row's
    start chunk equals n_chunks (one past the end). It must DROP from the
    chunk→row map — the pre-fix clip to n_chunks − 1 credited the last
    data chunk to the empty row, silently corrupting its tallies (TPU
    kernel output routing; bit-equality invariant)."""
    chunk_rows, n_chunks = 4, 4
    # Row 0 owns all 16 vote rows (chunks 0-3); row 1 is empty and starts
    # at row 16 == row_cap.
    r_of_chunk_start = jnp.asarray([0, 16], jnp.int32)
    cmap, start_chunk = voting_block._chunk_row_map(
        r_of_chunk_start, R=2, chunk_rows=chunk_rows, n_chunks=n_chunks)
    np.testing.assert_array_equal(np.asarray(start_chunk), [0, 4])
    # Every chunk belongs to row 0; none to the empty row 1.
    np.testing.assert_array_equal(np.asarray(cmap), [0, 0, 0, 0])
    # Empty MIDDLE row: rows 0 and 1 share start chunk 0 (row 0 empty),
    # row 1 owns chunks 0-1, row 2 owns 2-3.
    cmap2, _ = voting_block._chunk_row_map(
        jnp.asarray([0, 0, 8], jnp.int32), R=3, chunk_rows=chunk_rows,
        n_chunks=n_chunks)
    np.testing.assert_array_equal(np.asarray(cmap2), [1, 1, 2, 2])


def test_block_exact_full_vote_cap_bit_equal(rng):
    """End-to-end guard for the same corner on the XLA twin: size vote_cap
    EXACTLY to the expansion's total padded rows, with the last reference
    row contributing zero votes, and require bit-equal tallies vs the
    readable engine."""
    n_m, n_s, num_keys = 40, 36, 4096
    mkeys = rng.integers(0, num_keys, size=(n_m, n_m)).astype(np.int32)
    malpha = rng.uniform(-math.pi, math.pi, size=(n_m, n_m)) \
        .astype(np.float32)
    table = voting.build_key_table(jnp.asarray(mkeys), jnp.asarray(malpha),
                                   num_keys)
    tables = voting_block.build_block_tables(table)
    skeys = rng.integers(0, num_keys, size=(n_s, n_s)).astype(np.int32)
    skeys[-1, :] = ppf_ops.INVALID_KEY          # empty trailing ref row
    salpha = rng.uniform(-math.pi, math.pi, size=(n_s, n_s)) \
        .astype(np.float32)
    d_angle = 2.0 * math.pi / 30.0

    # Probe the exact padded row count with a generous cap, then re-run
    # with vote_cap sized exactly full.
    probe = voting_block._expand(jnp.asarray(skeys), jnp.asarray(salpha),
                                 tables, vote_cap=1 << 20,
                                 chunk_rows=voting_block.CHUNK_ROWS)
    total_rows_p = int(probe[6])
    assert total_rows_p % voting_block.CHUNK_ROWS == 0
    vote_cap = total_rows_p * voting_block.LANES

    res = voting_block.cast_votes_block(
        jnp.asarray(skeys), jnp.asarray(salpha), tables, n_m, d_angle,
        vote_cap=vote_cap)
    assert not bool(res.overflowed)
    ref = voting.cast_votes(jnp.asarray(skeys), jnp.asarray(salpha), table,
                            n_m, d_angle, vote_cap=1 << 20)
    assert int(res.num_votes) == int(ref.num_votes)
    np.testing.assert_array_equal(np.asarray(res.accumulator),
                                  np.asarray(ref.accumulator))
    # The empty trailing row's tallies must be all-zero.
    assert int(np.asarray(res.accumulator)[-1].sum()) == 0
