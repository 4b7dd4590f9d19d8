"""FNV-1a 32-bit hashing in uint32 lanes — bit-parity mode.

The reference hashes the raw little-endian bytes of each quantized float4
PPF with FNV-1a (offset basis 2166136261, prime 16777619; kernel.cu:23-30,
kernel.h:22) and uses the result as the model hash key. The rebuild's primary
key is the injective packed integer (ops.ppf.pack_key); this module proves
the quantized features are bit-identical by reproducing the reference's hash
values exactly, hashes int32 triples for translation-grid clustering parity
(trans2idx_kernel, kernel.cu:663-699), and provides the **operational FNV
keying mode** (`PPFConfig.use_fnv_keys`): a key-space remap that matches
through FNV hashes INCLUDING the reference's collision behavior — two
distinct quantized features whose hashes collide share one bucket, and a
feature hashing to 0 is conflated with "no feature" and skipped
(kernel.cu:467-470) — so pipeline-level vote tallies can be compared
bucket-for-bucket against a collision-afflicted reference run.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from objective_slam_tpu.ops import ppf as ppf_ops

FNV_OFFSET_BASIS = jnp.uint32(2166136261)
FNV_PRIME = jnp.uint32(16777619)


def _fnv1a_word(h, word):
    """Fold one little-endian uint32 word (4 bytes) into the hash."""
    for shift in (0, 8, 16, 24):
        byte = (word >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        h = (h ^ byte) * FNV_PRIME
    return h


def fnv1a_words(words, h0=FNV_OFFSET_BASIS):
    """FNV-1a over the bytes of uint32 words along the last axis.

    words: (..., k) uint32. Returns (...) uint32."""
    words = jnp.asarray(words, jnp.uint32)
    h = jnp.broadcast_to(h0, words.shape[:-1])
    for i in range(words.shape[-1]):
        h = _fnv1a_word(h, words[..., i])
    return h


def fnv1a_float4(f):
    """Hash of a float4's raw bytes, matching hash(f, sizeof(float4))
    (kernel.cu:23-30, 460-477). f: (..., 4) float32 -> (...) uint32."""
    words = jnp.asarray(f, jnp.float32).view(jnp.uint32)
    return fnv1a_words(words)


def fnv1a_int3(v):
    """Hash of an int3's raw bytes, matching hash(&int3, sizeof(int3))
    (trans2idx_kernel, kernel.cu:680). v: (..., 3) int32 -> (...) uint32."""
    words = jnp.asarray(v, jnp.int32).view(jnp.uint32)
    return fnv1a_words(words)


def packed_key_fnv(keys, d_dist, d_angle):
    """FNV-1a hash of the quantized float4 feature a packed key encodes.

    The reference hashes disc_feature's floats (quant_downf outputs,
    kernel.cu:460-477). quant_downf(x, step) = x − fmod(x, step) equals
    trunc(x/step)·step exactly as a real number, and one f32 subtraction
    rounds that real to nearest — identically to the one f32 multiply
    bin·step. Reconstructing bin·step here is therefore BIT-EQUAL to
    hashing the original quantized floats (property-tested in
    tests/test_ppf.py).

    INVALID_KEY → hash 0, the reference's NaN sentinel (a real feature
    that happens to hash to 0 is conflated with it and skipped — the
    reference's key-0 behavior, reproduced deliberately).

    keys: (...) int32 packed. Returns (...) uint32.
    """
    k = jnp.asarray(keys)
    a3 = (k & 15).astype(jnp.float32)
    a2 = ((k >> 4) & 15).astype(jnp.float32)
    a1 = ((k >> 8) & 15).astype(jnp.float32)
    db = (k >> 12).astype(jnp.float32)
    f = jnp.stack([db * jnp.float32(d_dist), a1 * jnp.float32(d_angle),
                   a2 * jnp.float32(d_angle), a3 * jnp.float32(d_angle)],
                  axis=-1)
    h = fnv1a_float4(f)
    return jnp.where(k == ppf_ops.INVALID_KEY, jnp.uint32(0), h)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["occ_hashes"], meta_fields=["k_occ"])
@dataclasses.dataclass(frozen=True)
class FnvRemap:
    """Model's occupied FNV hash dictionary for the FNV keying mode.

    occ_hashes — (K_pad,) uint32 SORTED unique nonzero model-feature
                 hashes (the remapped dense key space is their rank order);
                 pad rows repeat the last real hash (harmless: equality
                 still resolves to the first occurrence's rank).
    k_occ      — number of real entries (static).
    """
    occ_hashes: jax.Array
    k_occ: int


def build_fnv_remap(model_keys, d_dist, d_angle) -> FnvRemap:
    """Host-side: collect the model's occupied FNV buckets.

    Distinct packed keys whose features hash equal share one rank —
    the reference's collision conflation. Hash 0 is excluded (unreachable
    at match time, kernel.cu:467-470)."""
    h = np.asarray(packed_key_fnv(model_keys, d_dist, d_angle))
    h = np.unique(h[h != 0])
    k_occ = len(h)
    k_pad = max(((k_occ + 127) // 128) * 128, 128)
    occ = np.full((k_pad,), h[-1] if k_occ else 0, np.uint32)
    occ[:k_occ] = h
    return FnvRemap(occ_hashes=jnp.asarray(occ), k_occ=k_occ)


def fnv_remap_keys(keys, remap: FnvRemap, d_dist, d_angle):
    """Packed keys → dense FNV-bucket ranks (or INVALID_KEY).

    A scene pair matches the model bucket whose hash equals its feature's
    hash; misses (hash not in the model, or hash 0) become INVALID_KEY —
    the lower_bound-miss / key-0 skip of ppf_vote_count_kernel
    (kernel.cu:480-501)."""
    h = packed_key_fnv(keys, d_dist, d_angle)
    occ = remap.occ_hashes
    idx = jnp.searchsorted(occ, h).astype(jnp.int32)
    idx = jnp.clip(idx, 0, occ.shape[0] - 1)
    hit = (occ[idx] == h) & (h != jnp.uint32(0)) & (idx < remap.k_occ)
    return jnp.where(hit, idx, ppf_ops.INVALID_KEY)
