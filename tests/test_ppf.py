"""Golden tests for PPF features, quantization, packed keys, and FNV parity."""

import math

import numpy as np
import jax.numpy as jnp

from objective_slam_tpu.ops import hashing, ppf
import reference_impl as ref

D_ANGLE = 2 * math.pi / 30


def random_cloud(rng, n):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return pts, nrm.astype(np.float32)


def test_compute_ppf_matches_reference(rng):
    pts, nrm = random_cloud(rng, 16)
    for _ in range(30):
        i, j = rng.integers(0, 16, size=2)
        if i == j:
            continue
        got = np.asarray(ppf.compute_ppf(pts[i], nrm[i], pts[j], nrm[j]))
        want = ref.point_pair_feature(pts[i], nrm[i], pts[j], nrm[j])
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_quant_downf_matches_fmod():
    xs = np.array([0.0, 0.1, 0.99, 1.0, 2.49, 3.14159, 10.0], np.float32)
    step = np.float32(0.20943951)
    got = np.asarray(ppf.quant_downf(xs, step))
    want = np.array([x - math.fmod(float(x), float(step)) for x in xs],
                    np.float32)
    np.testing.assert_allclose(got, want, atol=0)


def test_disc_feature_matches_reference(rng):
    pts, nrm = random_cloud(rng, 8)
    d_dist = 0.25
    for i in range(8):
        for j in range(8):
            if i == j:
                continue
            F = ppf.compute_ppf(pts[i], nrm[i], pts[j], nrm[j])
            got = np.asarray(ppf.disc_feature(F, d_dist, D_ANGLE))
            want = ref.my_discretize(np.asarray(F, float), d_dist, D_ANGLE)
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_feature_bins_in_range(rng):
    pts, nrm = random_cloud(rng, 32)
    F = ppf.compute_ppf(pts[:, None], nrm[:, None], pts[None, :], nrm[None, :])
    db, ab = ppf.feature_bins(F, 0.25, D_ANGLE)
    ab = np.asarray(ab)
    mask = ~np.eye(32, dtype=bool)
    assert (ab[mask] >= 0).all() and (ab[mask] <= 15).all()
    assert (np.asarray(db)[mask] >= 0).all()


def test_pack_key_injective():
    # All combinations of bins round-trip uniquely.
    db = np.arange(20, dtype=np.int32)
    a = np.arange(16, dtype=np.int32)
    keys = np.asarray(ppf.pack_key(
        jnp.asarray(db)[:, None, None, None],
        jnp.stack(jnp.broadcast_arrays(
            jnp.asarray(a)[None, :, None, None],
            jnp.asarray(a)[None, None, :, None],
            jnp.asarray(a)[None, None, None, :]), axis=-1),
        max_dist_bin=19))
    assert keys.size == len(np.unique(keys)) == 20 * 16 ** 3


def test_pack_key_invalid_distance():
    key = ppf.pack_key(jnp.int32(25), jnp.array([1, 2, 3], jnp.int32),
                       max_dist_bin=19)
    assert int(key) == int(ppf.INVALID_KEY)


def test_pairwise_keys_match_scalar_path(rng):
    """The fused all-pairs path must agree with per-pair feature_key."""
    pts, nrm = random_cloud(rng, 12)
    d_dist = 0.3
    max_bin = 64
    keys, alpha = ppf.pairwise_ppf_keys(pts, nrm, d_dist, D_ANGLE, max_bin)
    keys = np.asarray(keys)
    for i in range(12):
        for j in range(12):
            if i == j:
                assert keys[i, j] == int(ppf.INVALID_KEY)
                continue
            F = ref.point_pair_feature(pts[i], nrm[i], pts[j], nrm[j])
            kd, k1, k2, k3 = ref.feature_key(
                ref.my_discretize(F, d_dist, D_ANGLE), d_dist, D_ANGLE)
            got = keys[i, j]
            g3 = got % 16
            g2 = (got // 16) % 16
            g1 = (got // 256) % 16
            gd = got // 4096
            # fp32 vs fp64 rounding can move a value across a bin boundary;
            # allow an off-by-one bin only when the fp64 feature is within
            # epsilon of that boundary (same tolerance class as the
            # reference's own fp32 path).
            for gb, rb, val, step in ((gd, kd, F[0], d_dist),
                                      (g1, k1, F[1], D_ANGLE),
                                      (g2, k2, F[2], D_ANGLE),
                                      (g3, k3, F[3], D_ANGLE)):
                if gb == rb:
                    continue
                assert abs(gb - rb) == 1, (i, j, gb, rb)
                frac = math.fmod(val, step) / step
                assert min(frac, 1 - frac) < 1e-4, (i, j, gb, rb, frac)


def test_pairwise_alpha_matches_trans_model_scene(rng):
    """α from the fused path equals the canonical-frame angle of each pair."""
    pts, nrm = random_cloud(rng, 10)
    _, alpha = ppf.pairwise_ppf_keys(pts, nrm, 0.3, D_ANGLE, 64)
    alpha = np.asarray(alpha)
    from objective_slam_tpu.ops import transforms as tr
    for i in range(10):
        for j in range(10):
            if i == j:
                continue
            T = np.asarray(tr.canonical_transform(pts[i], nrm[i]))
            u = (T @ np.array([*pts[j], 1.0]))[:3]
            want = math.atan2(u[2], u[1])
            assert abs(alpha[i, j] - want) < 1e-4


def test_ref_indices_subsampling(rng):
    """ref_point_df semantics: only strided rows are materialized."""
    pts, nrm = random_cloud(rng, 20)
    full_keys, full_alpha = ppf.pairwise_ppf_keys(pts, nrm, 0.3, D_ANGLE, 64)
    ref_idx = jnp.arange(0, 20, 5, dtype=jnp.int32)
    sub_keys, sub_alpha = ppf.pairwise_ppf_keys(pts, nrm, 0.3, D_ANGLE, 64,
                                                ref_indices=ref_idx)
    np.testing.assert_array_equal(np.asarray(sub_keys),
                                  np.asarray(full_keys)[::5])
    np.testing.assert_allclose(np.asarray(sub_alpha),
                               np.asarray(full_alpha)[::5], atol=0)


def test_fnv1a_float4_bit_parity(rng):
    """uint32-lane FNV-1a must match a byte-level implementation of the
    reference hash (kernel.cu:23-30) exactly."""
    f = rng.normal(size=(50, 4)).astype(np.float32)
    got = np.asarray(hashing.fnv1a_float4(jnp.asarray(f)))
    for i in range(50):
        assert int(got[i]) == ref.fnv1a_bytes(f[i].tobytes())


def test_fnv1a_int3_bit_parity(rng):
    v = rng.integers(-100, 100, size=(50, 3)).astype(np.int32)
    got = np.asarray(hashing.fnv1a_int3(jnp.asarray(v)))
    for i in range(50):
        assert int(got[i]) == ref.fnv1a_bytes(v[i].tobytes())


def test_keys_rigid_invariance(rng):
    """PPF keys are invariant under a rigid transform applied to the whole
    cloud (the property that makes Drost matching work); alpha angles shift
    consistently such that wrap(alpha_s - alpha_m) is preserved."""
    from objective_slam_tpu.utils import synthetic
    pts, nrm = random_cloud(rng, 24)
    q = synthetic.random_rotation_quat(rng)
    R = synthetic.quat_to_matrix(q)
    t = rng.normal(size=3).astype(np.float32)
    pts2 = (pts @ R.T + t).astype(np.float32)
    nrm2 = (nrm @ R.T).astype(np.float32)

    k1, a1 = ppf.pairwise_ppf_keys(pts, nrm, 0.3, D_ANGLE, 64)
    k2, a2 = ppf.pairwise_ppf_keys(pts2, nrm2, 0.3, D_ANGLE, 64)
    k1, k2 = np.asarray(k1), np.asarray(k2)
    # Keys equal except possibly at quantization boundaries (fp).
    same = k1 == k2
    assert same.mean() > 0.97
    # alpha differences between any two pairs sharing a reference point are
    # preserved mod 2pi (the voting quantity). Use a per-row base column
    # that is never the degenerate self pair.
    a1, a2 = np.asarray(a1), np.asarray(a2)
    n = a1.shape[0]
    rows = np.arange(n)
    base = (rows + 1) % n
    d1 = a1 - a1[rows, base][:, None]
    d2 = a2 - a2[rows, base][:, None]
    mask = ~np.eye(n, dtype=bool)
    wrap = lambda x: np.angle(np.exp(1j * x))
    np.testing.assert_allclose(wrap(d1 - d2)[mask], 0, atol=1e-3)


def test_keys_translation_invariance(rng):
    pts, nrm = random_cloud(rng, 16)
    k1, a1 = ppf.pairwise_ppf_keys(pts, nrm, 0.3, D_ANGLE, 64)
    k2, a2 = ppf.pairwise_ppf_keys(pts + np.float32(7.5), nrm, 0.3,
                                   D_ANGLE, 64)
    # Pure translation: keys AND alphas are bitwise-identical except fp
    # noise from the shifted coordinates.
    assert (np.asarray(k1) == np.asarray(k2)).mean() > 0.97
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-3)


def test_packed_key_fnv_matches_quantized_feature_hash(rng):
    """packed_key_fnv reconstructs bin·step floats bit-equal to quant_downf
    outputs, so its hash must equal FNV over the quantized feature floats —
    the reference's ppf_hash_kernel input (kernel.cu:460-477)."""
    pts, nrm = random_cloud(rng, 24)
    d_dist = 0.3
    keys, _ = ppf.pairwise_ppf_keys(pts, nrm, d_dist, D_ANGLE, 64)
    f = ppf.compute_ppf(pts[:, None, :], nrm[:, None, :],
                        pts[None, :, :], nrm[None, :, :])
    q = np.asarray(ppf.disc_feature(f, d_dist, D_ANGLE))
    got = np.asarray(hashing.packed_key_fnv(keys, d_dist, D_ANGLE))
    k = np.asarray(keys)
    valid = k != ppf.INVALID_KEY
    expect = np.asarray(hashing.fnv1a_float4(jnp.asarray(q)))
    np.testing.assert_array_equal(got[valid], expect[valid])
    assert (got[~valid] == 0).all()


def test_fnv_remap_conflates_collisions(rng):
    """Two distinct packed keys with colliding FNV hashes must map to the
    SAME rank (the reference's collision conflation). Collisions are found
    by brute force over a realistic key space (birthday: ~200k keys in
    2^32 leave a few)."""
    d_dist, max_db = 0.25, 60
    n_keys = ppf.num_keys(max_db)
    all_keys = jnp.arange(n_keys, dtype=jnp.int32)
    h = np.asarray(hashing.packed_key_fnv(all_keys, d_dist, D_ANGLE))
    order = np.argsort(h)
    hs = h[order]
    dup = np.nonzero((hs[1:] == hs[:-1]) & (hs[1:] != 0))[0]
    if len(dup) == 0:
        import pytest
        pytest.skip("no FNV collision in this key space")
    k1 = int(order[dup[0]])
    k2 = int(order[dup[0] + 1])
    assert k1 != k2 and h[k1] == h[k2]
    model_keys = jnp.asarray([[k1, k2, 17]], jnp.int32)
    remap = hashing.build_fnv_remap(model_keys, d_dist, D_ANGLE)
    rk = np.asarray(hashing.fnv_remap_keys(model_keys, remap, d_dist,
                                           D_ANGLE))[0]
    assert rk[0] == rk[1], rk          # conflated bucket
    assert rk[2] != rk[0]              # distinct feature, distinct bucket
    # A key absent from the model maps to INVALID.
    probe = jnp.asarray([[k1, 23]], jnp.int32)
    rp = np.asarray(hashing.fnv_remap_keys(probe, remap, d_dist,
                                           D_ANGLE))[0]
    assert rp[0] == rk[0] and rp[1] == ppf.INVALID_KEY
